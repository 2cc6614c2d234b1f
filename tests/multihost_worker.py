"""Worker process for the multi-host CI test (tests/test_multihost.py).

Runs REAL multi-process data-parallel training: jax.distributed over 2 CPU
processes × 2 virtual devices each (gloo collectives), per-process loader
shards, device_batch's make_array_from_process_local_data path, and two
lock-stepped Trainer steps with an orbax save.  Prints one final JSON line
the test asserts on.  This is the CPU stand-in for the multi-host DCN
wiring of SURVEY.md §3.5/§6.8.

Usage: python multihost_worker.py <process_id> <port> <out_dir>
"""
import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_dir = sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from trcnn.parallel import initialize

initialize(coordinator_address=f"localhost:{port}",
           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np

from __graft_entry__ import _tiny_cfg
from trcnn.data import DetectionLoader, SyntheticDetection
from trcnn.models import make_model
from trcnn.train import TrainConfig, Trainer

cfg = _tiny_cfg()
# tiny synthetic images matching the tiny canvas bucket
ds = SyntheticDetection(n=16, num_classes=cfg.num_classes,
                        hw_range=((48, 60), (64, 90)), seed=7)
GLOBAL_BATCH = 4
loader = DetectionLoader(
    ds, batch_size=GLOBAL_BATCH // jax.process_count(), image_cfg=cfg.image,
    shuffle=True, repeat=True, seed=0, workers=2,
    shard_id=jax.process_index(), num_shards=jax.process_count())

model = make_model(cfg)
ex = next(iter(loader))
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             np.asarray(ex.images), np.asarray(ex.im_info))

trainer = Trainer(model, params, cfg, TrainConfig(
    total_iters=2, log_every=1, checkpoint_every=2,
    checkpoint_dir=os.path.join(out_dir, "ckpt"), seed=0, use_mesh=True))
state = trainer.fit(iter(loader))

# multi-host eval path: each process decodes only its 1/n_hosts loader
# shard, contributes it to the collective detect via
# host_local_array_to_global_array, and the per-process detection lists
# are allgathered host-side — identical mAP everywhere with sharded work
from trcnn.eval import Evaluator

ev = Evaluator(model, cfg, ds, batch_size=GLOBAL_BATCH, limit=8,
               mesh=trainer.mesh)
eval_out = ev(state.params)
eval_map = float(eval_out["eval_mAP"])
eval_local = int(ev.last_local_images)  # decode work done by THIS process

# the replicated loss must be identical on every process (same global
# computation); grab it from a fresh metrics-producing step equivalent:
# use the final params' global norm as the cross-process fingerprint
fingerprint = float(jax.jit(
    lambda p: jax.tree_util.tree_reduce(
        lambda a, x: a + (x.astype(np.float32) ** 2).sum(), p, 0.0)
)(state.params))

print(json.dumps({"pid": pid, "step": int(state.step),
                  "fingerprint": round(fingerprint, 6),
                  "eval_mAP": round(eval_map, 6),
                  "eval_local_images": eval_local,
                  "eval_images": int(eval_out["eval_images"])}), flush=True)
