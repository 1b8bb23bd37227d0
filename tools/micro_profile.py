import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from raytracedicom_tpu.profiling import StageTimer
from raytracedicom_tpu.physics.interp import lut1d, lut2d, trilinear_border

S, Y, X = 512, 128, 128
key = jax.random.PRNGKey(0)
vals = jax.random.uniform(key, (S, Y, X), jnp.float32)
ct = jax.random.uniform(key, (256, 256, 256), jnp.float32)
pos = jax.random.uniform(key, (S, Y, X, 3), jnp.float32) * 250.0
tab1d = jnp.linspace(0, 1, 3072)
tab2d = jax.random.uniform(key, (147, 1024), jnp.float32)
idx_sx = vals * 1000.0

T = StageTimer()
T.time("elementwise x10", lambda v: (((v * 1.5 + 2) * v + jnp.sqrt(v)) * v + v**2) * (v + 3) * (v + 4) * (v + 5), vals)
T.time("cumsum axis0", lambda v: jnp.cumsum(v, axis=0), vals)
T.time("cummax axis0", lambda v: jax.lax.cummax(v, axis=0), vals)
T.time("lut1d 3072", lambda c: lut1d(tab1d, c), idx_sx)
T.time("lut2d scalar-row", lambda c: lut2d(tab2d, c, jnp.float32(3.7)), idx_sx)
T.time("take_along_axis ax0", lambda v: jnp.take_along_axis(v, (v * 400).astype(jnp.int32), axis=0), vals)
T.time("trilinear 256^3", lambda p: trilinear_border(ct, p), pos)
T.time("erf", lambda v: jax.scipy.special.erf(v), vals)
T.time("power", lambda v: jnp.power(jnp.maximum(v, 1e-6), 0.5649718), vals)
print(T.report())
