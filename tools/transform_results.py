"""CLI for eval-server submission packaging.

Mirrors the reference's standalone transform scripts
(RGBD/models/OSTrack/lib/test/utils/transform_got10k.py:45-52,
transform_trackingnet.py:34-41) over this repo's OPE result tree.

    python tools/transform_results.py got10k --results-root results --config deep_rgbd
    python tools/transform_results.py trackingnet --results-root results --config deep_rgbd
"""

from __future__ import annotations

import argparse

from mmtrack_tpu.eval.submission import transform_got10k, transform_trackingnet


def main() -> None:
    p = argparse.ArgumentParser(description="package OPE results for eval servers")
    p.add_argument("server", choices=["got10k", "trackingnet"])
    p.add_argument("--results-root", required=True)
    p.add_argument("--config", required=True, help="config name (result subdir)")
    p.add_argument("--dataset", default=None,
                   help="dataset subdir (defaults to the server name)")
    p.add_argument("--keep", action="store_true",
                   help="keep the unzipped trees (reference removes them)")
    a = p.parse_args()
    fn = transform_got10k if a.server == "got10k" else transform_trackingnet
    raw_zip, submit_zip = fn(a.results_root, a.config,
                             dataset=a.dataset or a.server,
                             cleanup=not a.keep)
    print(raw_zip)
    print(submit_zip)


if __name__ == "__main__":
    main()
