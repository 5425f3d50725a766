"""Worker process for the 2-process multi-host integration test.

Launched by tests/test_multihost.py (one subprocess per "host"), each with 4
virtual CPU devices → a global 8-device data-parallel mesh over Gloo.  Runs
the real Trainer end-to-end: process-sharded loaders, global-batch assembly
via make_array_from_process_local_data, streaming eval, primary-gated
checkpoint writes.  Prints one JSON line with the results for the parent to
assert on.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdeical_image_segmentation_tpu.parallel import distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.device_count() == 4 * nproc

from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset  # noqa: E402
from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel  # noqa: E402
from mdeical_image_segmentation_tpu.parallel import make_mesh  # noqa: E402
from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments  # noqa: E402

mesh = make_mesh()  # all 8 global devices on the data axis
train_ds = SyntheticSliceDataset(n_samples=32, resolution=32)
eval_ds = SyntheticSliceDataset(n_samples=7, resolution=32, seed=9)  # pad tail
model = UNetModel(
    UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=4)
)
args = TrainingArguments(
    output_dir=outdir,
    max_steps=4,
    per_device_train_batch_size=1,
    per_device_eval_batch_size=1,
    eval_strategy="no",
    logging_steps=2,
    save_steps=4,
    learning_rate=3e-3,
    augment=False,
)
trainer = Trainer(model, args, train_ds, eval_ds, mesh=mesh)
result = trainer.train()
metrics = trainer.evaluate()

print(
    "RESULT "
    + json.dumps(
        {
            "process": pid,
            "global_step": result.global_step,
            "train_loss": result.training_loss,
            "eval": metrics,
            "process_count": jax.process_count(),
        }
    ),
    flush=True,
)
