"""Two-process multi-host test (VERDICT weak-point: `jax.distributed` had
never actually executed).

Spawns two fresh python processes, each with 4 forced CPU devices, that
initialize ``jax.distributed`` against a local coordinator and drive the
framework's real multi-host paths: ``put_with_sharding`` (both batch-sharded
and replicated), a jitted cross-process reduction, and two ``Trainer.fit``
steps over the 8-device 2-process mesh. See ``multihost_worker.py``.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training():
    port = _free_port()
    env = dict(os.environ)
    # The axon sitecustomize imports jax at interpreter startup — platform
    # and device-count env must be in place BEFORE the child starts.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out, out

    def field(out, tag):
        for line in out.splitlines():
            if line.startswith(tag):
                return line.split()
        raise AssertionError(f"{tag} missing:\n{out}")

    for rc, out, err in outs:
        topo = field(out, "TOPOLOGY")
        assert topo[1] == "procs=2" and topo[2] == "devices=8", topo
        gm = field(out, "GLOBAL_MEAN")
        # the jitted global mean over the cross-process sharded batch
        # must equal the numpy mean of the CONCATENATED data
        assert abs(float(gm[1]) - float(gm[3])) < 1e-4, gm
        rs = field(out, "REPLICATED_SUM")
        assert abs(float(rs[1]) - 37.5) < 1e-4, rs

    # Both processes must finish training with IDENTICAL parameters (the
    # gradient all-reduce and replicated updates keep them in lockstep).
    d0 = float(field(outs[0][1], "PARAM_DIGEST")[1])
    d1 = float(field(outs[1][1], "PARAM_DIGEST")[1])
    np.testing.assert_allclose(d0, d1, rtol=1e-6)
