"""Multi-host dress rehearsal: the --multihost CLI under REAL multiple
processes (jax.distributed over the CPU backend, 2 processes x 2 devices).

This is the strongest multi-chip evidence obtainable without pod hardware:
unlike the in-process 8-device virtual mesh, each controller here has its own
address space — per-process host planners, device_put of global values,
cross-process collectives (Gloo), and readbacks of sharded arrays (eviction
writebacks / flush / eval probs) all run for real.

Mirrors the reference's multi-GPU flagship launch (torchx dist.ddp
``-j 1x${GPUNUM}``, /root/reference/scripts/kaggle.sh:80) — one controller
per device there, one per host here (the JAX pod model,
/root/reference/recsys/dlrm_main.py:378's launch_from_torch analog).
"""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "--platform", "cpu",
    "--use_cache", "--cache_ratio", "0.04", "--use_freq",
    "--batch_size", "128", "--embedding_dim", "32",
    "--num_embeddings_per_feature", "4000,4000,4000,4000",
    "--dense_arch_layer_sizes", "32,32", "--over_arch_layer_sizes", "32,1",
    "--limit_train_batches", "24", "--limit_val_batches", "2",
    "--limit_test_batches", "2", "--prefetch_num", "2",
]
# column-wise hybrid (the flagship mesh path) with int8 admit payloads
BASE_ARGS = COMMON + ["--transfer_dtype", "int8", "--use_overlap"]
# row-sharded cached: per-process host-table shards + directories, the
# >=2-host memory shape (parallel/row_cached.py)
ROWWISE_ARGS = COMMON + ["--use_rowwise"]
# tablewise (EP-style): each controller owns whole tables' host shards +
# directories; admits/writebacks stage through ONE lockstep shard_map program
TABLEWISE_ARGS = COMMON + ["--use_tablewise"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_dev: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    env.pop("JAX_PLATFORMS", None)  # --platform cpu handles it pre-backend
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _metrics(out: str) -> dict:
    m = {}
    for stage in ("val", "test"):
        g = re.search(rf"{stage}: auroc=([0-9.]+) accuracy=([0-9.]+)", out)
        assert g, f"no {stage} metrics in output:\n{out[-2000:]}"
        m[stage] = (float(g.group(1)), float(g.group(2)))
    g = re.search(r"final loss=([0-9.]+)", out)
    if g:
        m["loss"] = float(g.group(1))
    return m


def _run_single(extra_args) -> dict:
    cmd = [sys.executable, "-m", "cachedembedding_tpu.train.dlrm_main"] + extra_args
    r = subprocess.run(cmd, env=_env(4), cwd=REPO, capture_output=True,
                       text=True, timeout=420)
    assert r.returncode == 0, f"single-proc run failed:\n{r.stdout[-1500:]}\n{r.stderr[-1500:]}"
    return _metrics(r.stdout)


def _run_two_process(extra_args, tmpdir) -> list:
    # ranks write to FILES: draining two live PIPEs sequentially can deadlock
    # both ranks once one fills its pipe buffer mid-collective
    port = _free_port()
    procs, files = [], []
    for pid in range(2):
        cmd = [sys.executable, "-m", "cachedembedding_tpu.train.dlrm_main",
               "--multihost", "--coordinator_address", f"127.0.0.1:{port}",
               "--num_processes", "2", "--process_id", str(pid)] + extra_args
        out_f = open(os.path.join(tmpdir, f"rank{pid}.log"), "w+")
        files.append(out_f)
        procs.append(subprocess.Popen(
            cmd, env=_env(2), cwd=REPO,
            stdout=out_f, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p, f in zip(procs, files):
        try:
            p.wait(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        f.seek(0)
        out = f.read()
        f.close()
        assert p.returncode == 0, f"multiproc rank failed:\n{out[-3000:]}"
        outs.append(out)
    return outs


def test_two_process_cached_mesh_matches_single_process(tmp_path):
    """Column-wise hybrid: 2 processes x 2 devices == 1 process x 4 devices,
    bit-for-bit metrics, through eviction churn (swap_out > 0) + int8 admits
    + device-synth rows."""
    outs = _run_two_process(BASE_ARGS, str(tmp_path))
    m0, m1 = _metrics(outs[0]), _metrics(outs[1])
    assert m0 == m1, f"ranks disagree: {m0} vs {m1}"
    assert "swap_out" in outs[0]  # churn stats printed (readback path ran)

    ms = _run_single(BASE_ARGS)
    for stage in ("val", "test"):
        assert m0[stage] == ms[stage], (
            f"{stage}: 2-process {m0[stage]} != single-process {ms[stage]}"
        )


def test_two_process_tablewise_matches_single_process(tmp_path):
    """Tablewise (EP-style) under 2 real processes: per-controller table
    ownership, lockstep admit/writeback staging, replicated eval probs."""
    outs = _run_two_process(TABLEWISE_ARGS, str(tmp_path))
    m0, m1 = _metrics(outs[0]), _metrics(outs[1])
    assert m0 == m1, f"ranks disagree: {m0} vs {m1}"
    ms = _run_single(TABLEWISE_ARGS)
    assert m0["loss"] == ms["loss"]
    for stage in ("val", "test"):
        assert m0[stage] == ms[stage], (
            f"{stage}: 2-process {m0[stage]} != single-process {ms[stage]}"
        )


def test_two_process_rowwise_flush_master_identical(tmp_path):
    """dense_weight() under multi-process: after eviction churn + flush,
    every controller reconstructs the SAME full master (per-shard owner
    broadcast), equal to the single-process master on the same stream."""
    import numpy as np

    helper = os.path.join(REPO, "tests", "helpers", "mp_rowwise_flush.py")
    port = _free_port()
    procs, files = [], []
    for pid in range(2):
        out_f = open(os.path.join(str(tmp_path), f"fl{pid}.log"), "w+")
        files.append(out_f)
        env = _env(2)
        env["MASTER_OUT"] = os.path.join(str(tmp_path), f"master{pid}.npy")
        procs.append(subprocess.Popen(
            [sys.executable, helper, f"127.0.0.1:{port}", "2", str(pid)],
            env=env, cwd=REPO, stdout=out_f, stderr=subprocess.STDOUT,
        ))
    digests = []
    for p, f in zip(procs, files):
        try:
            p.wait(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        f.seek(0)
        out = f.read()
        f.close()
        assert p.returncode == 0, out[-3000:]
        g = re.search(r"MASTER_DIGEST (\w+)", out)
        assert g, out[-2000:]
        digests.append(g.group(1))
    # every controller reconstructs the SAME bytes (the owner-broadcast path)
    assert digests[0] == digests[1], "controllers reconstructed different masters"

    env = _env(4)
    env["MASTER_OUT"] = os.path.join(str(tmp_path), "master_single.npy")
    r = subprocess.run([sys.executable, helper], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    # vs single-process: allclose, NOT byte-equal — the dense-grad psum
    # reduces in a different association over Gloo than in-process XLA,
    # so trained rows differ by ULPs (metrics equality is covered by
    # test_two_process_rowwise_matches_single_process)
    m_mp = np.load(os.path.join(str(tmp_path), "master0.npy"))
    m_sp = np.load(os.path.join(str(tmp_path), "master_single.npy"))
    np.testing.assert_allclose(m_mp, m_sp, rtol=1e-4, atol=1e-5)


def test_two_process_rowwise_matches_single_process(tmp_path):
    """Row-sharded cached (the >=2-host shape): each controller constructs
    ONLY its own host-table shards + planners in its own address space; slot
    assignments are exchanged over the collective fabric. Metrics and final
    loss bit-identical to the single-process mesh."""
    outs = _run_two_process(ROWWISE_ARGS, str(tmp_path))
    m0, m1 = _metrics(outs[0]), _metrics(outs[1])
    assert m0 == m1, f"ranks disagree: {m0} vs {m1}"
    # per-host planners are genuinely independent: each rank reports ITS
    # shards' hit rate (they differ), yet training metrics agree
    ms = _run_single(ROWWISE_ARGS)
    assert m0["loss"] == ms["loss"]
    for stage in ("val", "test"):
        assert m0[stage] == ms[stage], (
            f"{stage}: 2-process {m0[stage]} != single-process {ms[stage]}"
        )
