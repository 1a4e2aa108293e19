"""2-process CPU multi-host test: the DCN-analog execution path.

SURVEY §2.9's comm-backend row demands a cross-host story; multi-host TPU
hardware is unavailable here, so this test runs the real multi-controller
runtime (``jax.distributed.initialize``, coordinator handshake, global mesh,
cross-process collectives) on CPU: 2 controller processes x 4 virtual devices
train a sharded SGLD fleet over the host-aware (chain, data) mesh and must
reproduce the single-process result.
"""
import os
import socket
import subprocess
import sys

import numpy as np
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid, nproc, port, outdir):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = ROOT
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), outdir],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def test_two_process_training_matches_single_process(tmp_path):
    outdir_ref = str(tmp_path / "ref")
    outdir_mp = str(tmp_path / "mp")
    os.makedirs(outdir_ref)
    os.makedirs(outdir_mp)

    # reference: identical training, single process
    ref = _spawn(0, 1, str(_free_port()), outdir_ref)
    ref_out, _ = ref.communicate(timeout=840)
    assert ref.returncode == 0, f"single-process reference failed:\n{ref_out}"

    # 2 controller processes, one coordinator port
    port = _free_port()
    procs = [_spawn(i, 2, port, outdir_mp) for i in range(2)]
    outs = [p.communicate(timeout=840)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    w_ref = np.load(os.path.join(outdir_ref, "collected_0.npy"))
    w_mp0 = np.load(os.path.join(outdir_mp, "collected_0.npy"))
    w_mp1 = np.load(os.path.join(outdir_mp, "collected_1.npy"))

    # both controllers hold the same global result
    np.testing.assert_array_equal(w_mp0, w_mp1)
    assert w_mp0.shape[0] == 8 and np.all(np.isfinite(w_mp0))
    # and it reproduces the single-process run (psum order may differ)
    assert w_ref.shape == w_mp0.shape
    np.testing.assert_allclose(w_mp0, w_ref, atol=1e-3)
    print(
        "2-process vs single-process max |dw| = "
        f"{float(np.max(np.abs(w_mp0 - w_ref))):.2e}"
    )
