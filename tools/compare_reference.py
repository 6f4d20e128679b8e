"""Pixel-parity check: kytpu vs the COMPILED reference renderer.

1. tools/reference_build/build_reference.sh   -> /tmp/ky_ref
2. cd /tmp && ./ky_ref 256                    -> /tmp/single.bmp (64 spp)
3. python tools/compare_reference.py /tmp/single.bmp /tmp/kytpu_single.bmp

Both images are gamma-encoded BMPs of the reference's production config
(cornell both_small_spheres|light_environment, 1024^2, depth 5, iterative
PT, both_mis). Downsampled comparison cancels Monte Carlo noise; the
remaining difference measures estimator parity.
"""

import sys

import numpy as np
from PIL import Image


def load(path):
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def down(img, f=8):
    h, w, _ = img.shape
    return img[:h // f * f, :w // f * f].reshape(
        h // f, f, w // f, f, 3).mean(axis=(1, 3))


def main(ref_path, ours_path, factor=8):
    a = down(load(ref_path), factor)
    b = down(load(ours_path), factor)
    diff = np.abs(a - b)
    print(f"downsample {factor}x: mean abs diff {diff.mean():.4f}, "
          f"p99 {np.percentile(diff, 99):.4f}, max {diff.max():.4f} "
          f"(8-bit gamma space, [0,1])")
    return diff.mean()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 8)
