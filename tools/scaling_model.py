"""Scaling-efficiency harness for the multi-chip flagship layouts.

Until a real multi-chip slice exists, quantify the scaling story two ways
(VERDICT r1 item 4):

  1. MEASURED collective bytes: compile each mesh step on the virtual
     n-device CPU mesh and sum the bytes moved by every collective in the
     optimized HLO (all-gather / reduce-scatter / all-reduce /
     collective-permute). This is the exact per-step comms volume the real
     slice will move — XLA emits the same collectives for the same program.
  2. MODELED step time: combine those bytes with the measured single-chip
     step time (BENCH_r01.json or --step_ms) and the ICI ring bandwidth to
     model step time and scaling efficiency at D chips:

        t(D) = t_compute/D + max(0, bytes·(D-1)/D / bw − overlap·t_blend/D)

     The gauss+tile layout software-pipelines the splat all-gather against
     the per-camera blend (parallel/sharded.py), so `overlap` credits up to
     the blend fraction of compute; the camera-parallel layout's psum is
     not overlapped (it sits between backward and Adam).

Run:  python tools/scaling_model.py [--step_ms 19.4] [--blend_frac 0.45]
Writes a table + one JSON line per (layout, D).

Assumed ICI: v5e 2D torus, ~4.5e10 B/s/direction/link, 2 links usable per
ring direction → ~9e10 B/s effective ring bandwidth per chip (jax-ml
scaling-book numbers; override with --ici_gbps).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}
_COLLECTIVES = ("all-gather", "reduce-scatter", "all-reduce",
                "collective-permute", "all-to-all")
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
                       r"\[([0-9,]*)\]")


def collective_bytes(compiled_text: str, loop_trip: int = 1) -> dict:
    """Sum output bytes of every collective op in optimized HLO text.

    A collective inside a while-loop BODY computation (the camera lax.scan
    in these steps) executes once per trip, so its bytes are multiplied by
    `loop_trip` (= k cameras; the only loops containing collectives here
    are the forward/backward camera scans — tile-chunk loops are
    collective-free)."""
    out: dict[str, float] = {k: 0.0 for k in _COLLECTIVES}
    body_names = set(re.findall(r"body=%?([\w.\-]+)", compiled_text))
    current, per_comp = None, {}
    for line in compiled_text.splitlines():
        s = line.strip()
        mc = re.match(r"^(?:ENTRY )?%?([\w.\-]+) (?:\([^)]*\))?.*\{$", s)
        if mc:
            current = mc.group(1)
            continue
        # match "<shape> <name> = collective-..." and tuple-shaped variants;
        # count the -start (it carries the shapes), skip the -done echo
        m = re.match(r"^(?:ROOT )?%?[\w.\-]+ = (.+?) (\w[\w\-]*)\(", s)
        if not m:
            continue
        shape_txt, op = m.groups()
        base = op.replace("-start", "")
        if base not in _COLLECTIVES or op.endswith("-done"):
            continue
        n = 0
        for dt, dims in _SHAPE_RE.findall(shape_txt):
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            n += elems * _DTYPE_BYTES[dt]
        per_comp.setdefault(current, {}).setdefault(base, 0)
        per_comp[current][base] += n
    for comp, counts in per_comp.items():
        mult = loop_trip if comp in body_names else 1
        for base, n in counts.items():
            out[base] += n * mult
    out["total"] = sum(out[k] for k in _COLLECTIVES)
    return out


def _build(n_dev: int, k: int, cap: int, width: int, height: int):
    from __graft_entry__ import _synthetic_scene
    from d3gs_tpu.config import (ModelParams, OptimizationParams,
                                 PipelineParams)
    from d3gs_tpu.data.cameras import stack_cameras
    from d3gs_tpu.models.deform import DeformFieldSpec, create_deform_field
    from d3gs_tpu.parallel.mesh import (make_mesh, replicate,
                                        shard_gaussian_state)
    from d3gs_tpu.parallel.sharded import (
        make_flagship_camera_parallel_step, make_flagship_gauss_tile_step)

    mesh = make_mesh(jax.devices()[:n_dev])
    state, cam0 = _synthetic_scene(n=cap, cap=cap, width=width,
                                   height=height, sh_degree=1)
    spec = DeformFieldSpec(kind="baseline", is_blender=True, D=2, W=32)
    dstate, field = create_deform_field(spec, jax.random.PRNGKey(0))
    dstate = replicate(dstate, mesh)
    opt_cfg = OptimizationParams()
    pipe_cfg = PipelineParams(tile_capacity=128, tile_chunk=4)
    model_cfg = ModelParams(is_blender=True)
    bg = jnp.zeros(3)
    kk = max(k, n_dev)  # camera-parallel needs k % n_dev == 0
    cams = stack_cameras(
        [dataclasses.replace(cam0, fid=jnp.asarray(i / max(kk - 1, 1)))
         for i in range(kk)])
    cams_gt = jax.tree.map(lambda x: x[:k], cams)

    out = {}
    st_s = shard_gaussian_state(state, mesh)
    gstep = make_flagship_gauss_tile_step(
        mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field, width=width, height=height)
    lowered = gstep.lower(st_s, dstate, cams_gt, jnp.asarray(1.0),
                          jax.random.PRNGKey(0), bg)
    out["gauss_tile"] = lowered.compile().as_text()

    st_r = replicate(state, mesh)
    cstep = make_flagship_camera_parallel_step(
        mesh, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg, model_cfg=model_cfg,
        field=field)
    lowered = cstep.lower(st_r, dstate, cams, jnp.asarray(1.0),
                          jax.random.PRNGKey(0), bg)
    out["camera"] = lowered.compile().as_text()
    return out


def model_step_ms(bytes_total: float, d: int, *, step_ms: float,
                  blend_frac: float, ici_bps: float,
                  overlapped: bool) -> tuple[float, float]:
    """Ring-collective step-time model (see module docstring)."""
    t_compute = step_ms / d
    t_comms = bytes_total * (d - 1) / d / ici_bps * 1e3
    if overlapped:
        t_comms = max(0.0, t_comms - blend_frac * t_compute)
    t = t_compute + t_comms
    eff = (step_ms / d) / t
    return t, eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4, help="cameras per step")
    ap.add_argument("--cap", type=int, default=2048,
                    help="gaussian capacity for the compiled probe")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--step_ms", type=float, default=19.4 * 4,
                    help="single-chip k-camera step time to scale "
                         "(default: 4 cams x bench 19.4ms)")
    ap.add_argument("--blend_frac", type=float, default=0.45,
                    help="fraction of compute the pipelined all-gather can "
                         "hide behind (blend share of the step)")
    ap.add_argument("--ici_gbps", type=float, default=90.0,
                    help="effective ring GB/s per chip (v5e ~2x45)")
    ap.add_argument("--dcn_gbps", type=float, default=25.0,
                    help="cross-host GB/s per host for the composed model")
    args = ap.parse_args()

    n_dev = min(8, jax.device_count())
    texts = _build(n_dev, args.k, args.cap, args.size, args.size)
    print(f"compiled on {n_dev}-device CPU mesh: k={args.k} cams, "
          f"N={args.cap} gaussians, {args.size}px")
    for layout, text in texts.items():
        cb = collective_bytes(text, loop_trip=args.k)
        per_n = cb["total"] / args.cap
        print(f"\n[{layout}] measured collective bytes/step: "
              f"{cb['total']:,} ({per_n:.0f} B/gaussian)"
              f"  breakdown: " + ", ".join(
                  f"{k}={v:,}" for k, v in cb.items()
                  if k != "total" and v))
        # scale measured bytes from the probe N to a production N: every
        # collective in these steps is linear in N (splat gather, grad
        # psum over per-gaussian params) — cameras replicate (gauss_tile)
        # or shard without comms (camera)
        for prod_n in (100_000,):
            scale = prod_n / args.cap
            overlapped = layout == "gauss_tile"
            print(f"  modeled at N={prod_n:,}, step_ms={args.step_ms} "
                  f"(overlap={'yes' if overlapped else 'no'}):")
            for d in (2, 4, 8, 16):
                t, eff = model_step_ms(
                    cb["total"] * scale, d, step_ms=args.step_ms,
                    blend_frac=args.blend_frac,
                    ici_bps=args.ici_gbps * 1e9, overlapped=overlapped)
                print(f"    D={d:>2}: step {t:7.2f} ms  efficiency "
                      f"{eff:5.1%}")
                print(json.dumps({
                    "layout": layout, "D": d, "N": prod_n,
                    "collective_bytes": cb["total"] * scale,
                    "modeled_step_ms": round(t, 3),
                    "modeled_efficiency": round(eff, 4)}))

    # composed 2-level layout across hosts: C camera groups over DCN
    # (one ~236 B/gaussian grad psum/step) x S-way gauss+tile inside each
    # host over ICI (splat gathers + halos stay intra-group). DCN ~25 GB/s
    # per host (scaling-book order of magnitude; override --dcn_gbps).
    prod_n = 100_000
    psum_bytes = 236 * prod_n
    ici_bytes = 128 * prod_n * args.k  # splat gather + bwd dual per group
    print("\n[composed CxS] modeled at N=100,000 "
          f"(DCN {args.dcn_gbps} GB/s outer, ICI {args.ici_gbps} GB/s "
          "inner):")
    for c, s in ((2, 4), (4, 4), (4, 8)):
        t_comp = args.step_ms / (c * s)
        t_dcn = psum_bytes * (c - 1) / c / (args.dcn_gbps * 1e9) * 1e3
        t_ici = max(0.0, ici_bytes * (s - 1) / s / (args.ici_gbps * 1e9)
                    * 1e3 - args.blend_frac * t_comp)
        t = t_comp + t_dcn + t_ici
        eff = t_comp / t
        print(f"    C={c} x S={s} ({c * s:>2} chips): step {t:7.2f} ms  "
              f"efficiency {eff:5.1%}")
        print(json.dumps({"layout": "composed", "C": c, "S": s,
                          "modeled_step_ms": round(t, 3),
                          "modeled_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
