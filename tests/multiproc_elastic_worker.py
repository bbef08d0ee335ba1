"""Worker for the two-process COORDINATED CHECKPOINT-RESTART drill
(test_multiprocess.py::test_elastic_kill_one_resume_both).

A 2-process Gloo job trains a sharded SAC learner with step-keyed batches,
checkpointing through ElasticCheckpointer after EVERY update. When
DGVIT_ELASTIC_KILL_AT=k is set, process 1 dies abruptly (os._exit) right
before update k — the partner process then blocks in its next cross-process
collective, exactly like losing a host mid-pod, and the launcher tears the
job down. A relaunch with the same checkpoint dir resumes BOTH processes
from the newest coordinated checkpoint and finishes the budget; because the
full train state (params, targets, optimizers, alpha, RNG) is checkpointed
and the data stream is step-keyed, the resumed run must be BIT-IDENTICAL to
an uninterrupted one (core/elastic.py module contract).

Env contract: COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
(core.distributed.initialize), DGVIT_MP_CKPT_DIR, DGVIT_MP_OUT,
DGVIT_ELASTIC_TOTAL (updates, default 4), DGVIT_ELASTIC_KILL_AT (optional).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def emit(name, **kw):
    line = "RESULT " + json.dumps({"scenario": name, **kw})
    out = os.environ.get("DGVIT_MP_OUT")
    if out:
        with open(out, "a") as f:
            f.write(line + "\n")
    print(line, flush=True)


def batch_for_step(step: int, b: int, hw):
    """Step-keyed global batch: every launch regenerates the identical data
    stream, so resume-vs-uninterrupted comparisons are exact."""
    import numpy as np

    rng = np.random.default_rng(1000 + step)
    return {
        "obs": rng.random((b,) + hw, np.float32),
        "act": (rng.random((b, 2), np.float32) * 2 - 1),
        "pobs": rng.random((b, 2), np.float32),
        "next_pobs": rng.random((b, 2), np.float32),
        "rew": rng.standard_normal((b, 1)).astype(np.float32),
        "next_obs": rng.random((b,) + hw, np.float32),
        "engage": np.zeros((b, 1), np.float32),
        "done": np.zeros((b, 1), np.float32),
    }


def main():
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dgvit_tpu.core import distributed
    distributed.initialize()

    import numpy as np

    from dgvit_tpu.agents import SACAgent
    from dgvit_tpu.config import Config
    from dgvit_tpu.core.elastic import ElasticCheckpointer
    from dgvit_tpu.core.mesh import AXIS_DATA, MeshRuntime
    from dgvit_tpu.parallel import shardmap_learn

    total = int(os.environ.get("DGVIT_ELASTIC_TOTAL", "4"))
    kill_at = os.environ.get("DGVIT_ELASTIC_KILL_AT", "")
    ckdir = os.environ["DGVIT_MP_CKPT_DIR"]

    cfg = Config.from_dict({
        "model": {"block": 2, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20),
                  "emb_dropout": 0.0},
        "sac": {"batch_size": 16},
    })
    agent = SACAgent(cfg, grad_axis=AXIS_DATA)
    rt = MeshRuntime.create(data=jax.device_count())
    learn = shardmap_learn(agent, rt, flavor="plain")
    ck = ElasticCheckpointer(ckdir, interval=1, keep=3)

    init = jax.device_put(agent.init_state(0), rt.replicated())
    template = jax.tree_util.tree_map(np.zeros_like, ck._gather_host(init))
    restored, start = ck.resume(template)
    state = (init if start == 0
             else jax.device_put(restored, rt.replicated()))
    emit("elastic_start", start=start,
         process_index=jax.process_index())

    b, hw = 16, (32, 40)
    for step in range(start, total):
        if kill_at and step == int(kill_at) and jax.process_index() == 1:
            # abrupt host loss BEFORE this update: no cleanup, no barrier —
            # the partner will block in its next collective
            os._exit(17)
        g = batch_for_step(step, b, hw)
        bsl = distributed.local_batch_slice(b)
        batch = {
            k: jax.make_array_from_process_local_data(
                rt.batch_sharding(v.ndim), np.ascontiguousarray(v[bsl]),
                global_shape=v.shape)
            for k, v in g.items()
        }
        state, _m = learn(state, batch)
        ck.save(step + 1, state)  # coordinated: barriers + collective write

    digest = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                       for l in jax.tree_util.tree_leaves(
                           state.actor_params)))
    emit("elastic_done", digest=digest, updates=total - start,
         start=start, process_index=jax.process_index())


if __name__ == "__main__":
    main()
