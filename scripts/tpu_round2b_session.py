"""One long-lived TPU process for the round-2 measurement backlog.

The axon tunnel's chip claim costs minutes per process (PERF.md), so the
remaining TPU sessions run back-to-back here: the 3D profile/roofline pass
(tpu_3d_profile.py) and the serving concurrency sweep (tpu_serve_bench.py).
Each writes its own /tmp/*.json; a failure in one does not stop the next.
"""

import os
import runpy
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))

for script in ("tpu_3d_profile.py", "tpu_serve_bench.py"):
    path = os.path.join(HERE, script)
    print(f"===== {script} start {time.strftime('%H:%M:%S')} =====", flush=True)
    try:
        runpy.run_path(path, run_name="__main__")
    except SystemExit:
        pass
    except Exception:
        traceback.print_exc()
    print(f"===== {script} end {time.strftime('%H:%M:%S')} =====", flush=True)

print("SESSION DONE", flush=True)
