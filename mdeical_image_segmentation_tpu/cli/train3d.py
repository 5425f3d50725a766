"""Config-driven 3D training entry point.

The reference has no CLI script for the 3D side (SURVEY.md §3.2 — training is
driven by ``create_trainer(load_config()).fit()``); this provides the missing
entry point with the same YAML + dotted-override config surface:

    python train3d.py --config config.yml [--optimizer.learning_rate 1e-3 ...]
"""

import sys


def main(argv=None):
    from mdeical_image_segmentation_tpu.configs import copy_config, load_config
    from mdeical_image_segmentation_tpu.train.trainer3d import create_trainer

    config = load_config(argv if argv is not None else sys.argv[1:])
    trainer = create_trainer(config)
    copy_config(config, trainer.checkpoint_dir)
    trainer.fit()


if __name__ == "__main__":
    main()
