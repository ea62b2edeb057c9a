"""CLI: COLMAP preprocessing for custom image sets (reference convert.py:
30-96 — feature extraction, matching, mapping, undistortion, resize
pyramid). Shells out to `colmap` and PIL (replacing ImageMagick)."""
import argparse
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd))
    rc = subprocess.call(cmd)
    if rc != 0:
        print(f"command failed with code {rc}", file=sys.stderr)
        sys.exit(rc)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--camera", default="OPENCV")
    parser.add_argument("--colmap_executable", default="colmap")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--resize", action="store_true",
                        help="emit images_2/, images_4/, images_8/")
    args = parser.parse_args(argv)

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        print(f"colmap executable {colmap!r} not found on PATH",
              file=sys.stderr)
        sys.exit(1)
    use_gpu = "0" if args.no_gpu else "1"
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted/sparse"), exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", f"{src}/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--output_path", f"{src}/distorted/sparse",
             "--Mapper.ba_global_function_tolerance=0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src, "--output_type", "COLMAP"])

    sparse_dir = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse_dir, "0"), exist_ok=True)
    for f in os.listdir(sparse_dir):
        if f != "0":
            shutil.move(os.path.join(sparse_dir, f),
                        os.path.join(sparse_dir, "0", f))

    if args.resize:
        from PIL import Image
        img_dir = os.path.join(src, "images")
        for div in (2, 4, 8):
            out_dir = os.path.join(src, f"images_{div}")
            os.makedirs(out_dir, exist_ok=True)
            for name in os.listdir(img_dir):
                im = Image.open(os.path.join(img_dir, name))
                im = im.resize((im.width // div, im.height // div))
                im.save(os.path.join(out_dir, name))
    print("Done.")


if __name__ == "__main__":
    main()
