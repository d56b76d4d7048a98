"""Why does a 16-token BERT forward copy the whole 47 MB bf16 vocab table?

perf/gdino_trace.py shows `%copy-start = bf16[30522,768] ... S(1)` pairs
costing ~10.6 ms per GroundingDINO forward — the word-embedding table being
staged every call, dwarfing the 16-row lookup it serves. Probe three
lowerings of the lookup on the tunneled chip:

  take     nn.Embed default (jnp.take on the bf16 table)
  onehot   one-hot(ids) @ table on the MXU — no gather, table read once
  f32take  table kept f32, take then cast (tests the bf16-table-copy theory)

Run: python perf/bert_embed_probe.py   (ONE tunnel client at a time)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.bert import BertConfig, BertEncoder
from instance_based_loc_tpu.models.precision import cast_params


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = jax.random.PRNGKey(0)
    cfg = BertConfig()
    enc = BertEncoder(cfg)
    ids = np.zeros((1, 16), np.int32)
    ids[0, :6] = [101, 4937, 1012, 3899, 1012, 102]
    ids = jnp.asarray(ids)
    p32 = enc.init(rng, ids)
    pbf = cast_params(p32, jnp.bfloat16)

    # NOTE: BertEncoder now uses OneHotEmbed (the change this probe
    # motivated), so this measures the CURRENT encoder path; the take
    # baseline survives in the isolated-lookup comparisons below.
    timeit("bert16tok bf16 (current)", jax.jit(enc.apply), pbf, ids)

    # isolated lookup lowerings on the raw table
    table = pbf["params"]["word_embeddings"]["embedding"]

    timeit("lookup take bf16", jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
           table, ids[0])
    timeit("lookup onehot bf16",
           jax.jit(lambda t, i: jax.nn.one_hot(i, t.shape[0], dtype=t.dtype)
                   @ t), table, ids[0])
    t32 = table.astype(jnp.float32)
    timeit("lookup take f32->bf16",
           jax.jit(lambda t, i: jnp.take(t, i, axis=0).astype(jnp.bfloat16)),
           t32, ids[0])


if __name__ == "__main__":
    main()
