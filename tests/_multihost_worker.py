"""Subprocess body for the multi-host tests (not collected by pytest).

Each worker is one JAX *process* of a 2-process run, with 4 virtual CPU
devices — together an 8-device global mesh spanning a process boundary,
the CPU stand-in for a 2-host TPU pod slice.

Modes:
  smoke <rank> <nprocs> <port>   — fast (no flax, no train step): distributed
      init, global mesh across the process boundary, shard_batch's
      make_array_from_process_local_data assembly, one psum collective,
      compile_synced + coordination_barrier. The fast-subset tier's
      process-boundary coverage (the parity/cli runs below are @slow).
  parity <rank> <nprocs> <port>  — low-level: sharded train step over the
      global mesh on a KNOWN global batch; prints per-step losses as JSON.
  cli <rank> <nprocs> <port> <run_dir> — end-to-end: the real train CLI
      with multi-host flags on a synthetic dataset; rank 0 prints the
      final checkpoint step.
"""

import json
import os
import sys


def _env_setup(local_devices: int = 4):
    # mirror tests/conftest.py, but N local devices per process
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    return jax


def tiny_cfg(batch: int):
    from motiondiffusion_moe_tpu.config import (
        DataConfig, DiffusionConfig, ExperimentConfig, ModelConfig,
        TrainConfig)
    return ExperimentConfig(
        name="mh",
        data=DataConfig(dim_pose=26, max_motion_length=16, num_joints=4),
        diffusion=DiffusionConfig(num_timesteps=100),
        model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=1, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dropout=0.0, stochastic_depth_min=1.0,
                          moe_compute="dense", dtype="float32"),
        train=TrainConfig(batch_size=batch, lr=1e-3, uncond_step=False),
    )


def global_batch(B: int):
    import numpy as np
    rng = np.random.default_rng(0)
    return {
        "motion": rng.standard_normal((B, 16, 26)).astype(np.float32),
        "length": np.full((B,), 16, np.int32),
        "text_ids": np.ones((B, 8), np.int32),
        "t": (np.arange(B) * 13 % 100).astype(np.int32),
        "t_weight": np.ones((B,), np.float32),
    }


def run_parity(rank: int, nprocs: int, port: int) -> None:
    jax = _env_setup()
    from motiondiffusion_moe_tpu.parallel.distributed import (
        initialize_distributed)
    initialize_distributed(f"localhost:{port}", nprocs, rank,
                           local_device_ids=list(range(4)))
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    import numpy as np
    from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
    from motiondiffusion_moe_tpu.models import MotionTransformer
    from motiondiffusion_moe_tpu.parallel import (
        make_mesh, make_sharded_train_step, shard_batch)
    from motiondiffusion_moe_tpu.training import (
        create_train_state, make_train_step)

    B = 8
    cfg = tiny_cfg(B)
    model = MotionTransformer(config=cfg.model)
    sched = make_schedule(schedule_name="linear", num_timesteps=100)
    # seed-identical params on every process (replicated)
    state = create_train_state(model, cfg, jax.random.key(0))
    raw = make_train_step(model, sched, cfg, jit=False)
    mesh = make_mesh(4 * nprocs)

    gb = global_batch(B)
    lo, hi = rank * (B // nprocs), (rank + 1) * (B // nprocs)
    local = {k: v[lo:hi] for k, v in gb.items()}

    with mesh:
        step, sstate = make_sharded_train_step(raw, state, mesh)
        losses = []
        for i in (1, 2):
            batch = shard_batch(local, mesh)
            assert batch["motion"].shape[0] == B, batch["motion"].shape
            sstate, metrics = step(sstate, batch, jax.random.key(i))
            losses.append(float(metrics["loss_total"]))
        print("RESULT " + json.dumps({
            "rank": rank,
            "losses": losses,
            "step": int(sstate.step),
        }), flush=True)


def run_smoke(rank: int, nprocs: int, port: int) -> None:
    """Minimal process-boundary exercise, built for speed: 2 local devices,
    no flax import, one tiny jitted psum. Covers the exact wiring the
    @slow tests prove at full depth — initialize_distributed, a global
    mesh spanning processes, shard_batch's process-local assembly, a
    cross-process collective, compile_synced, coordination_barrier."""
    jax = _env_setup(local_devices=2)
    from motiondiffusion_moe_tpu.parallel.distributed import (
        coordination_barrier, initialize_distributed)
    initialize_distributed(f"localhost:{port}", nprocs, rank,
                           local_device_ids=list(range(2)))
    assert jax.process_count() == nprocs
    ndev = 2 * nprocs
    assert len(jax.devices()) == ndev

    import numpy as np
    from motiondiffusion_moe_tpu.parallel import make_mesh, shard_batch
    from motiondiffusion_moe_tpu.parallel.distributed import compile_synced

    mesh = make_mesh(ndev)
    B = 2 * ndev  # 2 rows per device
    # each process contributes ITS rows of a known global batch; values
    # encode the global row index so the reduction proves true assembly
    gb = {"x": np.arange(B, dtype=np.float32)[:, None] * np.ones((B, 3),
                                                                 np.float32)}
    lo, hi = rank * (B // nprocs), (rank + 1) * (B // nprocs)
    local = {k: v[lo:hi] for k, v in gb.items()}
    with mesh:
        sharded = shard_batch(local, mesh)
        assert sharded["x"].shape == (B, 3)

        def global_sum(b):
            return b["x"].sum()

        fn = compile_synced(jax.jit(global_sum), "smoke")
        total = float(fn(sharded))
    expect = float(gb["x"].sum())
    assert total == expect, (total, expect)
    coordination_barrier("smoke_done")
    print(f"SMOKE_OK rank={rank} sum={total}", flush=True)


def run_cli(rank: int, nprocs: int, port: int, run_dir: str) -> None:
    _env_setup()
    from motiondiffusion_moe_tpu.tools.train import main
    main([
        "--name", "mhcli", "--dataset", "synthetic",
        "--checkpoint_dir", run_dir,
        "--synthetic_size", "32", "--batch_size", "8",
        "--num_epochs", "1", "--no_uncond_step",
        "--num_layers", "1", "--latent_dim", "32", "--ff_size", "16",
        "--num_heads", "2", "--num_experts", "2", "--text_latent_dim", "16",
        "--save_latest", "1000", "--no_native_io",
        "--coordinator_address", f"localhost:{port}",
        "--num_processes", str(nprocs), "--process_id", str(rank),
    ])
    if rank == 0:
        # read the step straight off the directory: constructing a second
        # CheckpointManager here would be a COLLECTIVE (directory-sync
        # barrier) that rank 1 — already past main() — never joins
        d = os.path.join(run_dir, "mhcli", "ckpt")
        steps = [int(x) for x in os.listdir(d) if x.isdigit()]
        print(f"CLI_OK step={max(steps)}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "smoke":
        run_smoke(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif mode == "parity":
        run_parity(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif mode == "cli":
        run_cli(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sys.argv[5])
    else:
        raise SystemExit(f"unknown mode {mode}")
