"""Generate committed golden fixtures (FIXTURES.md T4): per-model
feature vectors for the unit image rows at the pinned seeded weights.
Rerun only when semantics intentionally change; tests compare with
np.allclose(atol=1e-5) (the reference ATOL, enums.py:9)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pyarrow as pa, pyarrow.parquet as pq
from pic2vec_ray.fixtures.synth import make_image_row
from pic2vec_ray.stages.embed import EmbedActor

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
os.makedirs(OUT, exist_ok=True)

keys = list(range(1, 25))  # unit fixture: 24 rows covering all roles
rows = [make_image_row(k, f"caption {k}") for k in keys]
table = pa.table({name: [r[name] for r in rows] for name in
                  ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")})

for model, depth in (("tinynet", 1), ("squeezenet", 1), ("tinynet", 3)):
    actor = EmbedActor(model_str=model, depth=depth)
    out = actor(table)
    feats = np.stack([np.asarray(f) for f in out["features"].to_pylist()])
    g = pa.table({
        "image_id": out["image_id"],
        "missing": out["missing"],
        "features": out["features"],
    })
    path = os.path.join(OUT, f"features_golden_{model}_{depth}.parquet")
    pq.write_table(g, path)
    print(path, feats.shape)
