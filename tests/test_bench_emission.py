"""bench.py emission machinery (VERDICT r4 #1d): the driver-graded artifact
must be un-losable.  Runs bench.py as a subprocess in stub mode
(TPUSEG_BENCH_STUB=1 — canned rows, CPU forced in-process, no accelerator)
and asserts the progressive-emission contract:

- every stdout line is a complete parseable record of the bench schema,
- the headline line lands BEFORE extras run,
- a SIGTERM mid-extras still leaves a final record carrying the headline,
- watchdog budget exhaustion self-terminates with a record,
- a full run's tail carries every stub extra and status=complete.
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


class _Proc:
    """bench.py subprocess with a live line collector."""

    def __init__(self, env_extra, timeout=120):
        env = dict(os.environ, TPUSEG_BENCH_STUB="1", **env_extra)
        self.p = subprocess.Popen(
            [sys.executable, BENCH], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        self.lines = []
        self.timeout = timeout
        self._t = threading.Thread(target=self._drain, daemon=True)
        self._t.start()

    def _drain(self):
        for line in self.p.stdout:
            line = line.strip()
            if line:
                self.lines.append(line)

    def wait_for(self, pred, what):
        deadline = time.time() + self.timeout
        while time.time() < deadline:
            if any(pred(l) for l in list(self.lines)):
                return
            if self.p.poll() is not None and not any(
                    pred(l) for l in list(self.lines)):
                raise AssertionError(
                    f"process exited (rc={self.p.returncode}) before {what}; "
                    f"lines={self.lines!r} stderr={self.p.stderr.read()[-2000:]}")
            time.sleep(0.05)
        raise AssertionError(f"timed out waiting for {what}: {self.lines!r}")

    def finish(self):
        self.p.wait(timeout=self.timeout)
        self._t.join(timeout=10)
        return self.lines


def _records(lines):
    recs = [json.loads(l) for l in lines]  # every line must parse
    for r in recs:
        assert set(r) == {"metric", "value", "unit", "vs_baseline", "extra"}
        assert r["metric"] == "unet2d_train_throughput_256px_base64_bf16"
    return recs


def _is_headline(line):
    try:
        r = json.loads(line)
    except ValueError:
        return False
    return r["value"] > 0


@pytest.mark.slow
def test_full_stub_run_emits_progressively():
    proc = _Proc({"TPUSEG_BENCH_STUB_ROW_S": "0.05"})
    lines = proc.finish()
    assert proc.p.returncode == 0
    recs = _records(lines)
    # claim line, headline line, one per extra (3), final — and each is a
    # superset of the previous (progressive enrichment)
    assert len(recs) >= 5
    final = recs[-1]
    assert final["value"] == 1234.5
    assert final["vs_baseline"] == round(1234.5 / 1e4, 4)
    assert final["extra"]["status"] == "complete"
    for key in ("unet3plus_512px_reference_config_remat",
                "unet3d_fmaps32_64x128x128",
                "serve_engine_p50_256px_base16"):
        assert "row_elapsed_s" in final["extra"][key]
    # headline landed before any extra row
    first_headline = next(i for i, r in enumerate(recs) if r["value"] > 0)
    assert not any(
        k in recs[first_headline]["extra"]
        for k in ("unet3d_fmaps32_64x128x128",)
    )


def test_sigterm_mid_extras_leaves_parseable_headline():
    proc = _Proc({"TPUSEG_BENCH_STUB_ROW_S": "30"})
    proc.wait_for(_is_headline, "headline emission")
    time.sleep(0.3)  # let it enter the first (30 s) stub extra
    proc.p.send_signal(signal.SIGTERM)
    lines = proc.finish()
    recs = _records(lines)
    final = recs[-1]
    assert final["value"] == 1234.5  # the headline survived the kill
    assert "terminated" in final["extra"]
    assert final["extra"]["status"] == "headline done; extras running"


@pytest.mark.slow
def test_watchdog_budget_self_terminates_with_record():
    proc = _Proc({"TPUSEG_BENCH_STUB_ROW_S": "30",
                  "BENCH_TOTAL_BUDGET_S": "4"})
    lines = proc.finish()
    assert proc.p.returncode == 0
    recs = _records(lines)
    final = recs[-1]
    assert final["value"] == 1234.5
    assert "budget" in final["extra"].get("terminated", "")
