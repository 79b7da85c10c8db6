"""Regenerate stages/tokenizer.PINNED_MERGES from the sf0.001
documents table (the shipped-vocab fit). Run after any corpus
generator change:  python tools/refit_bpe.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    from pic2vec_ray.stages.tokenizer import fit_bpe

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])
    merges = fit_bpe(ds, num_merges=120)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "pic2vec_ray", "stages", "tokenizer.py")
    src = open(path).read()
    lines = ",\n    ".join(repr(m) for m in merges)
    new = re.sub(r"PINNED_MERGES: list\[tuple\[str, str\]\] = \[[^\]]*\]",
                 f"PINNED_MERGES: list[tuple[str, str]] = [\n    {lines},\n]",
                 src, count=1)
    with open(path, "w") as f:
        f.write(new)
    print(f"pinned {len(merges)} merges from {sf_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main()
