"""CLI: baseline trainer + SAM mask-consistency regularization.

Counterpart of the reference train_baseline_sam.py: per training image a
segmentation assigns Gaussians (projected to pixels) to masks, and the
variance of the deformation outputs over each mask's members is penalized —
things on the same object should move rigidly
(compute_mask_regularization, reference :45-152; weight 0.5 :272).

SAM2 itself is an external torch model; here masks enter as precomputed
per-image int32 label maps from --mask_dir (<image_name>.npy or .png — the
reference likewise caches masks to disk, :177-198). With no --mask_dir a
regular-grid segmentation is used as a weak rigidity prior (and as the
smoke-test path).

Example:
  python train_baseline_sam.py -s /data/nerf_ds/plate -m output/plate_sam \
      --mask_dir /data/nerf_ds/plate/sam_masks --mask_weight 0.5
"""
from __future__ import annotations

import argparse
import os

from d3gs_tpu import config as C


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="SAM-regularized deformable-3DGS trainer")
    C.add_group_args(parser, C.ModelParams)
    C.add_group_args(parser, C.PipelineParams)
    C.add_group_args(parser, C.OptimizationParams)
    parser.add_argument("--mask_dir", type=str, default="",
                        help="directory of per-image label maps")
    parser.add_argument("--segmenter", type=str, default="auto",
                        choices=["auto", "sam2", "slic", "grid"],
                        help="mask source when --mask_dir is not given: "
                             "generate + cache from the raw images (sam2 "
                             "when importable, slic superpixels otherwise; "
                             "reference train_baseline_sam.py:177-198) or "
                             "a plain grid")
    parser.add_argument("--mask_weight", type=float, default=0.5)
    parser.add_argument("--num_masks", type=int, default=64)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[5000, 6000, 7000] + list(
                            range(10000, 40001, 1000)))
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 10000, 20000, 30000, 40000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    model_cfg = C.extract_group(args, C.ModelParams)
    pipe_cfg = C.extract_group(args, C.PipelineParams)
    opt_cfg = C.extract_group(args, C.OptimizationParams)

    if not model_cfg.model_path:
        import uuid
        model_cfg.model_path = os.path.join("./output", str(uuid.uuid4())[:10])
    os.makedirs(model_cfg.model_path, exist_ok=True)
    C.save_cfg_args(model_cfg.model_path, model_cfg)

    import jax.numpy as jnp
    import numpy as np

    from d3gs_tpu.data.scene import Scene
    from d3gs_tpu.train.baseline import train_baseline
    from d3gs_tpu.train.sam_reg import (grid_label_map, load_label_maps,
                                        mask_regularization)

    scene = Scene(model_cfg, capacity=pipe_cfg.capacity, seed=args.seed)
    train_cams = scene.get_train_cameras()

    names = [c.image_name for c in train_cams]
    if args.mask_dir:
        maps = load_label_maps(args.mask_dir, names, args.num_masks)
        missing = [n for n in names if n not in maps]
        if missing:
            print(f"warning: {len(missing)} images have no mask; "
                  "grid fallback used for those")
    elif args.segmenter != "grid":
        # generate + cache masks from the raw training images, the
        # reference's end-to-end flow (train_baseline_sam.py:177-198)
        from d3gs_tpu.train.segment import load_or_generate_label_maps
        maps = load_or_generate_label_maps(
            train_cams, model_cfg.source_path, args.num_masks,
            method=args.segmenter, progress=not args.quiet)
    else:
        maps = {}
        print("--segmenter grid: using regular-grid segmentation as a "
              "weak rigidity prior")

    label_cache = {}
    for c in train_cams:
        lab = maps.get(c.image_name)
        if lab is None:
            lab = grid_label_map(c.height, c.width,
                                 cells=int(np.sqrt(args.num_masks)))
        label_cache[id(c)] = jnp.asarray(lab, jnp.int32)

    num_masks = args.num_masks
    weight = args.mask_weight

    def extra_loss(out, deform_out, camera, state, labels):
        dx, dr, ds = deform_out
        xyz = state.params.xyz
        deformed = xyz + dx if isinstance(dx, type(xyz)) else xyz
        return weight * mask_regularization(
            labels, num_masks, deformed, camera.projmatrix, dx, dr, ds,
            state.alive, camera.width, camera.height)

    result = train_baseline(
        gaussians=scene.gaussians,
        train_cams=train_cams,
        test_cams=scene.get_test_cameras(),
        cameras_extent=scene.cameras_extent,
        model_cfg=model_cfg, opt_cfg=opt_cfg, pipe_cfg=pipe_cfg,
        test_iterations=set(args.test_iterations),
        save_iterations=set(args.save_iterations + [opt_cfg.iterations]),
        model_path=model_cfg.model_path, seed=args.seed,
        progress=not args.quiet,
        extra_loss_fn=extra_loss,
        aux_data_fn=lambda cam: label_cache[id(cam)])

    print(f"Best PSNR = {result.best_psnr:.2f} "
          f"in Iteration {result.best_iteration}")
    return result


if __name__ == "__main__":
    main()
