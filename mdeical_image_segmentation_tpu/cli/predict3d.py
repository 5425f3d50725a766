"""Sliding-window prediction entry point (config-driven).

Completes the reference's intended 3D inference path (SURVEY.md §3.3: the
reference ships the predictor but no CLI).  Config keys: top-level
``model_path`` (a training checkpoint — the reference's prediction-config
convention; ``model.model_path`` is accepted as a fallback), ``model``,
``loaders.test`` (files, slice_builder with patch==stride + halo_shape,
transformer), ``predictor`` (name/out options), ``output_dir``.

    python predict3d.py --config test_config.yml
"""

import sys


def main(argv=None):
    import jax

    from mdeical_image_segmentation_tpu.configs import load_config
    from mdeical_image_segmentation_tpu.data import get_test_loaders
    from mdeical_image_segmentation_tpu.infer import get_predictor
    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.train import load_checkpoint

    config = load_config(argv if argv is not None else sys.argv[1:])
    model = get_model(config["model"])

    model_path = config.get("model_path") or config["model"].get("model_path")
    if not model_path:
        raise KeyError(
            "prediction config needs a top-level 'model_path' (or "
            "'model.model_path') pointing at a training checkpoint"
        )
    state = load_checkpoint(model_path)
    model_state = state["model_state_dict"]
    variables = {"params": model_state["params"]}
    if model_state.get("batch_stats"):
        variables["batch_stats"] = model_state["batch_stats"]

    output_dir = config.get("output_dir")
    predictor = get_predictor(model, variables, output_dir, config)
    for test_loader in get_test_loaders(config):
        predictor(test_loader)


if __name__ == "__main__":
    main()
