#!/usr/bin/env python
"""Diagnose the compiled sweep-gather mismatch: where and how it fails."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from recmodels_tpu.embedding import pallas_gather

nbuf = int(sys.argv[1]) if len(sys.argv) > 1 else 8
pallas_gather.NBUF = nbuf
n_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000
rng = np.random.default_rng(0)
R, D = 512 * n_tiles, 17
table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
packed = jax.jit(pallas_gather.pack)(table)
ids = np.sort(rng.integers(0, R, size=N)).astype(np.int32)
out = np.asarray(jax.jit(pallas_gather.sorted_gather)(packed, jnp.asarray(ids))[:, :D])
ref = np.asarray(table[ids].astype(jnp.bfloat16))
bad = np.any(out != ref, axis=1)
print(f"NBUF={nbuf} mismatched rows: {bad.sum()} / {N}")
if bad.sum():
    idxs = np.where(bad)[0]
    tp = pallas_gather.TP
    tiles = ids[idxs] // pallas_gather.TR
    print("first bad positions:", idxs[:20].tolist())
    print("bad pos %% tp histogram (first 20):", (idxs[:20] % tp).tolist())
    print("chunk of bad:", (idxs[:50] // tp).tolist())
    print("tile of bad ids:", tiles[:20].tolist())
    # per-chunk tile span for the bad chunks
    ids_pad = ids
    for c in sorted(set((idxs // tp).tolist()))[:10]:
        lo = ids_pad[c * tp] // 512
        hi = ids_pad[min((c + 1) * tp, N) - 1] // 512
        nbad = int(bad[c * tp:(c + 1) * tp].sum())
        print(f"chunk {c}: tiles [{lo},{hi}] n_t={hi - lo + 1} bad={nbad}/{tp}")
    # are outputs zero, or wrong-row values?
    z = np.all(out[idxs] == 0, axis=1)
    print("bad rows that are all-zero:", int(z.sum()), "of", len(idxs))
