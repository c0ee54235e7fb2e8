"""Init-augmentation transform parity: dimp_init_augmentations vs the
reference's augmentation.* transforms, patch by patch.

The DiMP trajectory check feeds the REFERENCE'S augmented patches into
our state machine, which proves the loop but leaves our own transform
implementations (ops/augment.py: shifted window, fliplr, separable blur,
fused rotation gather) untested against the originals. This check runs
both on the same expanded 2x crop: our shifts (returned by
dimp_init_augmentations) are handed verbatim to the reference's
Transform(shift=...) constructors so every sample — identity, 4 relative
shifts, flip, 3 blurs, 4 rotations — is pixel-comparable.

Tolerances: windowing/flip are exact; blur is a separable gaussian both
sides (conv order/float noise); rotation compares our fused
dst->src gather against cv2.warpAffine's fixed-point (5-bit fractional)
bilinear remap, so per-pixel agreement is bounded by cv2's coordinate
quantization — we gate on a small mean deviation and a 99th percentile
rather than max.

Run: python tools/parity/check_augmentation.py
Prints one JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.parity.refload import (  # noqa: E402
    patch_cuda_to_cpu,
    reference_available,
    reference_path,
)

TOL_EXACT = 2e-5    # identity/shift/flip windows (pure gather)
TOL_BLUR_MAX = 2e-2     # separable gaussian, normalized kernels
TOL_ROT_MEAN = 2e-2     # cv2 fixed-point remap vs float gather
TOL_ROT_P99 = 0.2


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=96)
    args = ap.parse_args(argv)
    if not reference_available():
        print(json.dumps({"skipped": "reference tree not found"}))
        return 0

    import types

    import torch

    patch_cuda_to_cpu()
    if "torch._six" not in sys.modules:  # removed in torch>=2
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mmtrack_tpu.ops.augment import (BLUR_SIGMAS, RELATIVE_SHIFTS,
                                         ROTATE_ANGLES,
                                         dimp_init_augmentations)

    S = args.size
    rng = np.random.RandomState(args.seed)
    # textured expanded patch, values in the normalized-feature range
    expanded = rng.uniform(-2.0, 2.0, (2 * S, 2 * S, 6)).astype(np.float32)

    ours, shifts = dimp_init_augmentations(
        jnp.asarray(expanded), S, jax.random.PRNGKey(args.seed),
        random_shift_factor=1.0 / 3.0)
    ours = np.asarray(ours)
    shifts = np.asarray(shifts).astype(int)

    with reference_path("RGBD/models/DeT"):
        aug = importlib.import_module("pytracking.features.augmentation")

        t = torch.from_numpy(
            expanded.transpose(2, 0, 1)[None])  # (1, 6, 2S, 2S)
        out_sz = [S, S]
        transforms = [aug.Identity(out_sz, list(shifts[0]))]
        k = 1
        for _rel in RELATIVE_SHIFTS:
            transforms.append(aug.Translation(list(shifts[k]), out_sz, [0, 0]))
            k += 1
        transforms.append(aug.FlipHorizontal(out_sz, list(shifts[k])))
        k += 1
        for sig in BLUR_SIGMAS:
            transforms.append(aug.Blur(sig, out_sz, list(shifts[k])))
            k += 1
        for ang in ROTATE_ANGLES:
            transforms.append(aug.Rotate(ang, out_sz, list(shifts[k])))
            k += 1
        assert k == len(shifts)

        ref = torch.cat([T(t) for T in transforms]).numpy()  # (N, 6, S, S)

    ref = ref.transpose(0, 2, 3, 1)
    n_exact = 1 + len(RELATIVE_SHIFTS) + 1
    n_blur = len(BLUR_SIGMAS)
    devs = np.abs(ours - ref).reshape(len(ref), -1)

    exact_dev = float(devs[:n_exact].max())
    blur_dev = float(devs[n_exact:n_exact + n_blur].max())
    rot = devs[n_exact + n_blur:]
    rot_mean = float(rot.mean())
    rot_p99 = float(np.percentile(rot, 99))

    res = {
        "family": "init-augmentations",
        "samples": int(len(ref)),
        "window_flip_max_dev": exact_dev,
        "blur_max_dev": blur_dev,
        "rotate_mean_dev": rot_mean,
        "rotate_p99_dev": rot_p99,
        "rotate_max_dev": float(rot.max()),
        "pass": bool(exact_dev <= TOL_EXACT and blur_dev <= TOL_BLUR_MAX
                     and rot_mean <= TOL_ROT_MEAN and rot_p99 <= TOL_ROT_P99),
        "tol": {"exact": TOL_EXACT, "blur": TOL_BLUR_MAX,
                "rot_mean": TOL_ROT_MEAN, "rot_p99": TOL_ROT_P99},
    }
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
