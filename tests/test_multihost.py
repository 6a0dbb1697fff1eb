"""Multi-host scale-out evidence: 2 processes x 4 virtual CPU devices run
the batch-sharded transform over one GLOBAL mesh and produce output
byte-identical to a single-process run — backing the claim in
parallel/mesh.py that multi-host over DCN is the same sharding with a
global mesh (no collectives in the math path)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(tmp_path, mode: str, nproc: int = 2, local_devices: int = 4):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own XLA_FLAGS device count; drop the test
    # session's 8-device forcing so it cannot leak through
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), coord,
             str(tmp_path), mode, str(local_devices)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multihost worker timed out ({mode})")
        logs.append(out)
    for pid, (p, out) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            if "distributed" in out and "NotImplemented" in out:
                pytest.skip("jax.distributed unavailable on this platform")
            pytest.fail(f"worker {pid} rc={p.returncode}\n{out[-3000:]}")
    return nproc


def _reference(B=16):
    # single-process reference with the worker's exact config and frames
    import jax

    from transform360_tpu import TransformConfig, build_plan, chroma_dims
    from transform360_tpu.config import Interpolation, StereoFormat
    from transform360_tpu.pipeline import transform_planes

    IN_W, IN_H, OUT_W, OUT_H = 256, 128, 96, 64
    cfg = TransformConfig(
        input_stereo_format=StereoFormat.MONO,
        output_stereo_format=StereoFormat.MONO,
        interpolation_alg=Interpolation.CUBIC,
        enable_low_pass_filter=1,
    )
    plan = build_plan(cfg, IN_W, IN_H, OUT_W, OUT_H)
    rng = np.random.default_rng(0)
    cw, ch = chroma_dims(IN_W, IN_H)
    y = rng.integers(0, 256, (B, IN_H, IN_W), dtype=np.uint8)
    u = rng.integers(0, 256, (B, ch, cw), dtype=np.uint8)
    v = rng.integers(0, 256, (B, ch, cw), dtype=np.uint8)
    return [np.asarray(p) for p in transform_planes(plan, y, u, v)]


def _assemble(tmp_path, nproc: int, B: int):
    outs = []
    for name in "yuv":
        idx_all, frames_all = [], []
        for pid in range(nproc):
            z = np.load(os.path.join(tmp_path, f"p{pid}_{name}.npz"))
            idx_all.append(z["idx"])
            frames_all.append(z["frames"])
        idx = np.concatenate(idx_all)
        frames = np.concatenate(frames_all, axis=0)
        assert sorted(idx.tolist()) == list(range(B)), (
            f"plane {name}: processes did not cover the global batch "
            f"exactly once: {sorted(idx.tolist())}"
        )
        full = np.empty((B,) + frames.shape[1:], frames.dtype)
        full[idx] = frames
        outs.append(full)
    return outs


@pytest.mark.parametrize("mode", ["local", "full"])
def test_two_process_matches_single(tmp_path, mode):
    nproc = _spawn_workers(tmp_path, mode)
    got = _assemble(str(tmp_path), nproc, B=16)
    want = _reference(B=16)
    for name, g, w in zip("yuv", got, want):
        assert g.shape == w.shape
        assert np.array_equal(g, w), (
            f"plane {name}: multihost output differs from single-process"
        )


def test_two_process_banded_matches_single(tmp_path):
    """Multi-host single-frame latency sharding: each process computes a
    contiguous group of the global output row-bands on its own devices;
    the slices stitched in process order are byte-identical to the
    single-process frame."""
    nproc = _spawn_workers(tmp_path, "banded")
    want = _reference(B=16)
    for name, w in zip("yuv", want):
        parts = [
            np.load(os.path.join(str(tmp_path), f"p{pid}_{name}.npz"))[
                "rows"
            ]
            for pid in range(nproc)
        ]
        got = np.concatenate(parts, axis=0)
        assert got.shape == w[0].shape
        assert np.array_equal(got, w[0]), (
            f"plane {name}: banded multihost slice stitch differs"
        )
