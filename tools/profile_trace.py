"""Per-op device-time breakdown of the FULL train step via jax.profiler.

Runs a handful of steps under jax.profiler.trace, then parses the dumped
trace.json.gz (TensorBoard trace-viewer format) and aggregates device-stream
op durations by HLO op name prefix. Complements profile_true.py (which gives
whole-stage numbers but no attribution).
"""
import collections
import glob
import gzip
import json
import math
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from d3gs_tpu.models import gaussians as G
from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
from d3gs_tpu.data.cameras import Camera
from d3gs_tpu.ops.camera_math import perspective_projection, world_to_view
from d3gs_tpu.config import OptimizationParams, PipelineParams
from d3gs_tpu.train.step import make_train_step

W = H = 400
N = 43_132
CAP = 44_032

rng = np.random.default_rng(0)
pts = (rng.random((N, 3)) * 2.6 - 1.3).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
state = G.create_from_pcd(pts, cols, sh_degree=3, capacity=CAP,
                          spatial_lr_scale=4.0)
state = state.replace(
    active_sh_degree=jnp.asarray(3, jnp.int32),
    params=state.params._replace(opacity=jnp.full((CAP, 1), 0.5)))

V = world_to_view(np.eye(3), np.array([0.0, 0.0, 4.0])).T
fov = math.radians(60)
P = perspective_projection(0.01, 100.0, fov, fov).T
cam = Camera(
    viewmatrix=jnp.asarray(V, jnp.float32),
    projmatrix=jnp.asarray(V @ P, jnp.float32),
    campos=jnp.asarray(np.linalg.inv(V)[3, :3], jnp.float32),
    fid=jnp.asarray(0.5),
    image=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
    width=W, height=H, fovx=fov, fovy=fov)

spec = DeformFieldSpec(kind="baseline", is_blender=True)
dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
opt_cfg = OptimizationParams()
pipe_cfg = PipelineParams(tile_capacity=1024, tile_chunk=25,
                          dup_capacity=393_216)
step = make_train_step(
    opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
    deform_fn=lambda p, x, f, i, k: field.step(p, x, f),
    deform_update_fn=field.update, donate=False)
bg = jnp.zeros(3)
key = jax.random.PRNGKey(0)


@jax.jit
def run10(st, dst):
    def body(i, c):
        s, d, it = c
        s2, d2, _ = step(s, d, cam, 3001.0 + it, key, bg)
        return (s2, d2, it + 1.0)
    return jax.lax.fori_loop(0, 10, body, (st, dst, jnp.asarray(0.0)))


out = run10(state, dstate)                    # compile + warm
print("warm sum", float(jnp.sum(out[0].params.xyz)), flush=True)

logdir = "/tmp/jax_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    out = run10(state, dstate)
    print("traced sum", float(jnp.sum(out[0].params.xyz)), flush=True)

files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
agg = collections.Counter()
total = 0.0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    # find device-stream PIDs (TensorCore ops live on "/device:TPU:0" pids)
    dev_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm and "Host" not in nm.lower():
                dev_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3   # us -> ms
        # aggregate by op-name prefix (strip .NNN suffixes / fusion ids)
        base = re.sub(r"[.\d]+$", "", name)
        agg[base] += dur
        total += dur
print(f"\ntotal device time over 10 steps: {total:.2f} ms "
      f"({total/10:.2f} ms/step)\n")
for name, ms in agg.most_common(40):
    print(f"{ms/10:8.3f} ms/step  {name}")
