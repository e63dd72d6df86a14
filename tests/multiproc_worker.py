"""Worker for the real two-process distributed smoke test.

Launched as ``python tests/multiproc_worker.py <pid> <nprocs> <port> <out>``.
Each process owns ``8 // nprocs`` virtual CPU devices; with ``nprocs > 1``
``jax.distributed.initialize`` connects them into one 8-device global mesh —
the exact multi-controller environment a TPU pod run uses, executing the
multi-host branches (`make_array_from_process_local_data` in
``parallel.mesh.shard_batch``, ``process_allgather`` in ``fetch_global``,
``multihost_indices`` in the Loader) for real rather than via single-process
index math.

Runs 2 global train steps + one device-readout eval through the production
Trainer and writes the resulting param norm / loss / metric summary as JSON
(process 0).  The single-process variant (``nprocs=1``) produces the golden
values; metrics are permutation-invariant over the batch, so the strided
multi-host input split must reproduce them.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(pid: int, nprocs: int, port: int, out: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={8 // nprocs}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # smoke test: skip expensive XLA passes (2x faster compile; the
    # dryrun verified numerics are unchanged)
    jax.config.update("jax_disable_most_optimizations", True)
    if nprocs > 1:
        jax.distributed.initialize(f"localhost:{port}",
                                   num_processes=nprocs, process_id=pid)
    assert jax.device_count() == 8, jax.devices()
    assert jax.local_device_count() == 8 // nprocs
    assert jax.process_count() == nprocs

    import numpy as np
    import optax

    from ccvpe_tpu.data import pipeline, vigor
    from ccvpe_tpu.models import cvm
    from ccvpe_tpu.train.harness import Trainer

    cfg = cvm.NANO
    n_samples, global_batch = 16, 8

    def sample_fn(i):
        rng = np.random.default_rng(1000 + int(i))
        rotation = np.float32(rng.uniform(-0.5, 0.5))
        return {
            "grd": rng.integers(0, 255, (*cfg.grd_hw, 3)).astype(np.uint8),
            "sat": rng.integers(0, 255, (*cfg.sat_hw, 3)).astype(np.uint8),
            "rotation": rotation,
            "angle": np.float32(rotation * 360.0),
            "row_offset": np.float32(rng.uniform(-20, 20)),
            "col_offset": np.float32(rng.uniform(-20, 20)),
        }

    dev_train = lambda raw: vigor.device_batch(
        raw, train=True, sat_hw=cfg.sat_hw, bins=cfg.bins)
    dev_eval = lambda raw: vigor.device_batch(
        raw, train=False, sat_hw=cfg.sat_hw, bins=cfg.bins)

    # zero1=True: the optimizer state shards over a data axis spanning BOTH
    # processes — exercises the sharded-state train step and the
    # fetch_global-based host gather (checkpointing path) under a real
    # multi-host layout; numerics-neutral vs the replicated single-process
    # golden run (tests/test_train.py::test_zero1_matches_replicated)
    trainer = Trainer(cfg, results_dir=out + f".results{pid}",
                      batch_size=global_batch, log_every=1,
                      zero1=nprocs > 1)
    trainer.init_state(seed=7)

    loader = pipeline.Loader(sample_fn, np.arange(n_samples), global_batch,
                             num_workers=2, multihost=True)
    trainer.train_epoch(loader, dev_train, epoch=0)

    # the checkpointing host-gather: device_get would raise on the ZeRO-1
    # shards living on the other process's devices
    host_state = trainer._host_state()
    param_norm = float(optax.global_norm(host_state.params))
    opt_norm = float(optax.global_norm(host_state.opt_state))
    assert np.isfinite(opt_norm)
    step = int(np.asarray(host_state.step))

    # checkpoint round-trip on a shared directory: orbax coordinates the
    # write across processes (primary writes, all barrier); restore must
    # reproduce the gathered state
    from ccvpe_tpu.io.checkpoint import CheckpointManager

    ck = CheckpointManager(out + ".ck", max_to_keep=1)
    ck.save(step, host_state, wait=True)
    restored = ck.restore(host_state)
    r_norm = float(optax.global_norm(restored.params))
    assert abs(r_norm - param_norm) < 1e-6 * max(param_norm, 1.0), (
        f"checkpoint round-trip norm {r_norm} != {param_norm}")

    eval_loader = pipeline.Loader(sample_fn, np.arange(n_samples),
                                  global_batch, num_workers=2,
                                  multihost=True)
    summary = trainer.evaluate(eval_loader, dev_eval, meter_per_pixel=0.1)
    summary.pop("pairs_per_sec", None)

    # full-heatmap (device_readout=False) path: on multi-host this
    # materializes the global heatmap batch on every process via
    # fetch_global — must agree with the readout path and the golden run
    eval_loader2 = pipeline.Loader(sample_fn, np.arange(n_samples),
                                   global_batch, num_workers=2,
                                   multihost=True)
    summary_hm = trainer.evaluate(eval_loader2, dev_eval,
                                  meter_per_pixel=0.1,
                                  device_readout=False)
    summary_hm.pop("pairs_per_sec", None)

    result = {"param_norm": param_norm, "step": step, "summary": summary,
              "summary_hm": summary_hm, "nprocs": nprocs}
    if pid == 0:
        with open(out, "w") as f:
            json.dump(result, f)
    print(f"worker {pid}/{nprocs} done: step={step} "
          f"param_norm={param_norm:.6f}")

    # straggler-proof exit: process 0 simulates a slow end-of-run effect
    # (orbax finalize / results write on shared storage); the named
    # finalize barrier must absorb the skew so all processes hit the
    # distributed runtime's implicit shutdown barrier together instead of
    # desyncing there (the round-4 pod CLI failure mode)
    if nprocs > 1 and pid == 0:
        import time

        time.sleep(15)
    from ccvpe_tpu.parallel import mesh as mesh_lib

    mesh_lib.finalize_run("worker-complete")


if __name__ == "__main__":
    run(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
