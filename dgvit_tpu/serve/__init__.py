"""Deployment/serving layer: AOT actor export + batching inference server.

The reference's deployable artifact is the trained actor network alone
(testing.py:67-80 loads a bare GoTPolicy state_dict and drives the robot
with its deterministic mean action) — but PyTorch deployment still drags
the whole framework along. Here the actor exports to a single serialized
StableHLO artifact (jax.export): batch-size polymorphic, runnable on CPU
and TPU, loadable without model code, config, or even this package's
weights format. `BatchingActorServer` wraps any action fn (jitted or
exported) behind a thread-safe micro-batching queue for many-robot /
many-client serving.
"""

from dgvit_tpu.serve.export import (export_actor, load_actor,
                                    make_action_fn)
from dgvit_tpu.serve.fleet import FleetRunner, make_ros2_fleet, serve_fleet
from dgvit_tpu.serve.server import BatchingActorServer

__all__ = ["export_actor", "load_actor", "make_action_fn",
           "BatchingActorServer", "FleetRunner", "make_ros2_fleet",
           "serve_fleet"]
