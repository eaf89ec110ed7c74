"""Multi-host (multi-controller) SPMD support — parallel/distributed.py.

The reference has no distributed story at all (SURVEY.md §2.9). These tests
exercise ours with REAL multi-process jax.distributed jobs: subprocesses on
the CPU backend talk Gloo over localhost, each owning a slice of a global
device mesh, and their results are compared against single-process runs of
the identical harness (same global device count -> the compiled SPMD
program, and therefore the numerics, must match).
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_job(mode: str, tmp_path, nproc: int, devices_per_proc: int,
             timeout: int = 600, extra_env: dict | None = None) -> list[dict]:
    """Launch `nproc` worker processes; return their JSON results by rank.

    Gloo's key-exchange window for the first collective is a fixed 30 s; on
    this 1-core host a contended run (xdist sibling + a background compile)
    can stagger the workers' jax-import/trace phases past it, failing
    rendezvous with DEADLINE_EXCEEDED before any of OUR code is at fault.
    That exact signature gets one bounded retry; every other failure is
    fatal on the first attempt.
    """
    prior_logs: list[str] = []
    for attempt in (0, 1):
        port = _free_port()
        procs, outs = [], []
        for pid in range(nproc):
            out = str(tmp_path / f"{mode}_{nproc}p_{pid}.json")
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                                f"{devices_per_proc}")
            env["JAX_PLATFORMS"] = "cpu"
            env.update(extra_env or {})
            if nproc > 1:
                env["NL_VSGG_COORDINATOR"] = f"127.0.0.1:{port}"
                env["NL_VSGG_NUM_PROCESSES"] = str(nproc)
                env["NL_VSGG_PROCESS_ID"] = str(pid)
            else:
                for k in ("NL_VSGG_COORDINATOR", "NL_VSGG_NUM_PROCESSES",
                          "NL_VSGG_PROCESS_ID"):
                    env.pop(k, None)
            procs.append(subprocess.Popen(
                [sys.executable, WORKER, mode, out], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
            outs.append(out)
        logs = []
        for p in procs:
            stdout, _ = p.communicate(timeout=timeout)
            logs.append(stdout.decode("utf-8", "replace"))
        # Retry when ANY failed worker shows a rendezvous-timeout signature
        # (phrased differently per phase: "Gloo context initialization
        # failed", "GetKeyValue() timed out", connectFullMesh timeouts) —
        # the peer of a stalled worker dies with its own, differently-worded
        # error. A genuine crash still surfaces after the single bounded
        # retry WITH the attempt-0 logs preserved in the assertion message,
        # so no evidence is lost to the retry (advisor r4).
        failed = [pid for pid, p in enumerate(procs) if p.returncode != 0]
        rendezvous_flake = failed and any(
            ("Gloo" in logs[pid] or "GetKeyValue" in logs[pid])
            and ("DEADLINE_EXCEEDED" in logs[pid]
                 or "timed out" in logs[pid])
            for pid in failed)
        if rendezvous_flake and attempt == 0:
            prior_logs = [f"--- attempt 0, worker {pid} ---\n{logs[pid][-1500:]}"
                          for pid in failed]
            time.sleep(10)  # xdist-sibling contention is transient
            continue
        assert not failed, "\n".join(
            [f"worker {pid} rc={procs[pid].returncode}\n{logs[pid][-3000:]}"
             for pid in failed] + prior_logs)
        return [json.load(open(o)) for o in outs]


@pytest.mark.xdist_group("multiproc")
def test_allgather_and_merge_two_process(tmp_path):
    """allgather_obj returns every process's object in rank order, and
    merge_evaluators leaves all processes with the concatenated lists."""
    res = _run_job("gather", tmp_path, nproc=2, devices_per_proc=1)
    for r in res:
        assert r["nproc"] == 2
        assert [g["pid"] for g in r["gathered"]] == [0, 1]
        assert r["gathered"][1]["payload"] == [0, 1]
        # two fake per-video recalls per process, concatenated in rank order
        assert r["recall20"] == [0.25, 0.25, 0.5, 0.5]
        assert r["nogc20"] == [0.5, 1.0]
        assert r["mr_collect"] == [1.0, 2.0]
    assert res[0]["mean_r20"] == res[1]["mean_r20"]


def test_distributed_batcher_single_process():
    """nproc=1 path over the virtual 8-device mesh: bucket agreement,
    failed-slot zero fill, on-device zero union features."""
    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.parallel.distributed import DistributedBatcher
    from nl_vsgg_tpu.parallel.mesh import make_mesh

    entries = []
    for i in range(4):
        r = np.random.default_rng(100 + i)
        bb = 16 if i % 2 == 0 else 32
        entries.append(make_synthetic_entry(r, n_frames=3, objs_per_frame=2,
                                            bucket_boxes=bb, bucket_rels=bb,
                                            feat_dim=32))
    ground = lambda i: None if i == 3 else entries[i]
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])

    batches = list(DistributedBatcher(ground, [0, 1, 2, 3], 4, mesh,
                                      feat_dim=32, zero_union=True))
    assert len(batches) == 1
    b = batches[0]
    # agreed bucket = max over members (mixed 16/32 buckets)
    assert b.boxes.shape == (4, 32, 4)
    assert b.pair_idx.shape == (4, 32, 2)
    # zero-union ships the width-0 channel; the models' union_projection
    # turns it into the exact bias broadcast (models/sttran.py)
    assert b.union_feat.shape == (4, 32, 7, 7, 0)
    # slot 3 failed grounding -> inert (valid-weighted step skips it)
    bm = np.asarray(b.box_mask)
    assert bm[:3].any(axis=1).all() and not bm[3].any()
    # re-padded 16-bucket entries keep their real rows
    np.testing.assert_allclose(np.asarray(b.boxes)[0, :16],
                               np.asarray(entries[0].boxes), rtol=0, atol=0)
    # ragged tail (< batch) is dropped, not mis-shaped
    tail = list(DistributedBatcher(ground, [0, 1, 2, 3, 0, 1], 4, mesh,
                                   feat_dim=32))
    assert len(tail) == 1


def test_batcher_rejects_bad_batch_size():
    from nl_vsgg_tpu.parallel.distributed import DistributedBatcher
    from nl_vsgg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="data axis"):
        DistributedBatcher(lambda i: None, [0, 1], 2, mesh)


@pytest.mark.slow
@pytest.mark.xdist_group("multiproc")
def test_two_process_cli_training(tmp_path):
    """Full tools/train_STTran.py run as a 2-process jax.distributed job on
    the shared micro AG dataset: global batches, Orbax multi-controller
    checkpointing, sharded + merged epoch evaluation, primary-only logging."""
    from tests.fixtures import build_micro_ag

    ag = build_micro_ag(str(tmp_path), n_videos=4, n_frames=3, feat_dim=32)
    import yaml
    cfg = {"mode": "sgdet", "lr": 1e-4, "nepoch": 2, "enc_layer": 1,
           "dec_layer": 1, "feat_dim": 32, "bce_loss": True,
           "batch_videos": 2, "data_path": ag,
           # r5: the device store composes with multi-controller runs —
           # epoch 0 adopts the batcher's global batches, epoch 1 must be
           # served by SPMD gathers (asserted on the primary's log below)
           "device_entry_store_gb": 1.0,
           "pseudo_localized_SG_path": os.path.join(ag, "final_ag_data_w_neg.pkl"),
           "frame_features_path": os.path.join(ag, "frame_features"),
           "save_path": str(tmp_path / "out")}
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    # the axon plugin ignores the JAX_PLATFORMS env var, so the CLI is run
    # under a tiny wrapper that pins the platform via jax.config (the same
    # thing tests/conftest.py does in-process)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy, sys; "
            f"sys.argv = ['train_STTran.py', '--cfg', {cfg_path!r}]; "
            f"runpy.run_path({os.path.join(REPO, 'tools', 'train_STTran.py')!r},"
            f" run_name='__main__')")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["JAX_PLATFORMS"] = "cpu"
        env["NL_VSGG_COORDINATOR"] = f"127.0.0.1:{port}"
        env["NL_VSGG_NUM_PROCESSES"] = "2"
        env["NL_VSGG_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = [p.communicate(timeout=900)[0].decode("utf-8", "replace")
            for p in procs]
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"rank {pid} rc={p.returncode}\n{logs[pid][-4000:]}"
    # primary-only artifacts, written once
    assert os.path.isdir(os.path.join(cfg["save_path"], "ckpt", "1"))
    assert os.path.isfile(os.path.join(cfg["save_path"], "metrics.jsonl"))
    recs = [json.loads(l) for l in open(
        os.path.join(cfg["save_path"], "metrics.jsonl"))]
    assert any("mean_r20" in r for r in recs)
    assert "distributed: process" in logs[0]
    # warm epoch served from the multi-controller store
    assert "device entry store sharded over data=2" in logs[0], logs[0][-3000:]
    assert any("gathered batches" in ln and "device entry store: 0 " not in ln
               for ln in logs[0].splitlines()), logs[0][-3000:]


@pytest.mark.slow
@pytest.mark.xdist_group("multiproc")
def test_two_process_train_step_matches_single(tmp_path):
    """2 processes x 2 devices == 1 process x 4 devices, same global mesh:
    the train losses and final parameter digest must agree (identical SPMD
    program over identical global data; only the controller count differs)."""
    single = _run_job("train", tmp_path, nproc=1, devices_per_proc=4)[0]
    double = _run_job("train", tmp_path, nproc=2, devices_per_proc=2)
    assert single["losses"], "no batches ran"
    for r in double:
        assert r["nproc"] == 2
        np.testing.assert_allclose(r["losses"], single["losses"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r["digest"], single["digest"],
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.xdist_group("multiproc")
def test_two_process_device_store(tmp_path):
    """Multi-controller device entry store (r5): both processes compute the
    IDENTICAL shard-balanced plan, their SPMD gathers match the host-side
    expectation (asserted inside the worker), and a gathered batch drives
    the sharded train step — all equal to the single-process run of the
    same harness."""
    single = _run_job("store", tmp_path, nproc=1, devices_per_proc=4)[0]
    double = _run_job("store", tmp_path, nproc=2, devices_per_proc=2)
    for r in double:
        assert r["nproc"] == 2
        assert r["plan"] == single["plan"]
        np.testing.assert_allclose(r["digests"], single["digests"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r["loss"], single["loss"],
                                   rtol=1e-5, atol=1e-6)
    assert double[0]["plan"] == double[1]["plan"]


@pytest.mark.slow
@pytest.mark.xdist_group("multiproc")
def test_two_process_model_parallel_matches_single(tmp_path):
    """Same cross-controller parity on a (data=2, model=2) mesh: wide Dense
    kernels shard over 'model' across the process boundary, the video batch
    over 'data' — both against the single-process run of the same mesh."""
    env = {"NL_VSGG_TEST_MODEL_PAR": "2"}
    single = _run_job("train", tmp_path, nproc=1, devices_per_proc=4,
                      extra_env=env)[0]
    double = _run_job("train", tmp_path, nproc=2, devices_per_proc=2,
                      extra_env=env)
    assert single["losses"], "no batches ran"
    for r in double:
        np.testing.assert_allclose(r["losses"], single["losses"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r["digest"], single["digest"],
                                   rtol=1e-5, atol=1e-6)
