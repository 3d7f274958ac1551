"""Round-2 micro-benchmarks: isolate the suspect primitives inside the
band-pairs and binning stages at flagship shapes (N=16448 cap, T=1024,
pairs=32768, splat entries=294912, vcells~25k, cap=48)."""

import time
import sys
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


N, T = 16448, 1024
rng = np.random.default_rng(0)
plane = jnp.asarray(rng.standard_normal((N, 2 * T)), jnp.float32)
flat = plane.reshape(-1)
widx = jnp.asarray(rng.integers(0, N * 2 * T - 8, (N, 7)), jnp.int32)
start = jnp.asarray(rng.integers(0, N * 2 * T // 8 - 2, (N,)), jnp.int32)

# (a) current: flat scalar window gather (N,7) x 4 planes
@jax.jit
def win_scalar(flat, widx):
    return tuple(flat[widx] * (i + 1) for i in range(4))

# (b) row-pair gather: 2 rows of 8 per particle x 4 planes + shift select
@jax.jit
def win_rows(plane, start):
    rows8 = plane.reshape(-1, 8)
    outs = []
    for i in range(4):
        r0 = rows8[start]          # (N, 8)
        r1 = rows8[start + 1]      # (N, 8)
        w16 = jnp.concatenate([r0, r1], axis=1) * (i + 1)
        outs.append(w16)
    return tuple(outs)

# (c) dense (N, T) cone sweep: slice + sqrt + masked min reduction
cursor = jnp.int32(517)
@jax.jit
def dense_sweep(plane, cursor):
    px = jax.lax.dynamic_slice(plane, (0, cursor), (N, T))
    py = jax.lax.dynamic_slice(plane, (0, cursor + 1), (N, T))
    r = jnp.sqrt(px * px + py * py)
    age = jnp.arange(T, dtype=jnp.float32)[None, ::-1]
    f = r - age * 0.005
    ok = f <= 0.0076
    a0 = jnp.min(jnp.where(ok, age, 1e9), axis=1)
    return a0

# (d) scalar scatter ids: 295k -> 1.2M
E, V, CAP = 294912, 25680, 48
slot = jnp.asarray(rng.integers(0, V * CAP, (E,)), jnp.int32)
sval = jnp.asarray(rng.integers(0, 32768, (E,)), jnp.int32)
rows10 = jnp.asarray(rng.standard_normal((E, 10)), jnp.float32)
@jax.jit
def scat_ids(slot, sval):
    out = jnp.full((V * CAP + 1,), -1, jnp.int32)
    return out.at[slot].set(sval)

# (e) row scatter of 10-wide rows: 295k -> (1.2M, 10)
@jax.jit
def scat_rows(slot, rows10):
    out = jnp.full((V * CAP + 1, 10), 2e9, jnp.float32)
    return out.at[slot].set(rows10)

# (f) row gather (current densify): 1.2M slots row-gather from (32k, 10)
pdata = jnp.asarray(rng.standard_normal((32768, 10)), jnp.float32)
vslot = jnp.asarray(rng.integers(0, 32768, (V * CAP,)), jnp.int32)
@jax.jit
def gath_rows(pdata, vslot):
    return pdata[vslot]

# (g) sort 295k key-val
key = jnp.asarray(rng.integers(0, V, (E,)), jnp.int32)
@jax.jit
def sort_kv(key, sval):
    return jax.lax.sort_key_val(key, sval)

# (h) s_first per-pixel row gather: 2.07M pixels from (4096, 8) table
P = 1920 * 1080
sfirst_rows = jnp.asarray(rng.standard_normal((4096, 8)), jnp.float32)
rix = jnp.asarray(rng.integers(0, 4096, (P,)), jnp.int32)
@jax.jit
def sfirst_gather(sfirst_rows, rix):
    return sfirst_rows[rix][:, 0]

# (i) scalar gather 2.07M from (4096,)
sfirst1 = sfirst_rows[:, 0]
@jax.jit
def sfirst_scalar(sfirst1, rix):
    return sfirst1[rix]

names = [
    ("win_scalar (N,7)x4", win_scalar, (flat, widx)),
    ("win_rows 2x8 x4    ", win_rows, (plane, start)),
    ("dense (N,T) sweep  ", dense_sweep, (plane, cursor)),
    ("scat ids 295k      ", scat_ids, (slot, sval)),
    ("scat rows10 295k   ", scat_rows, (slot, rows10)),
    ("gath rows10 1.2M   ", gath_rows, (pdata, vslot)),
    ("sort kv 295k       ", sort_kv, (key, sval)),
    ("sfirst row-gth 2M  ", sfirst_gather, (sfirst_rows, rix)),
    ("sfirst scal-gth 2M ", sfirst_scalar, (sfirst1, rix)),
]
for nm, fn, args in names:
    print(f"{nm}: {timeit(fn, *args):7.3f} ms")
