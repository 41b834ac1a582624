"""Time XLA compile of the registration program (diagnostic)."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.core.types import PointBatch
from loam_livox_tpu.registration.icp import register_frame

cfg = SlamConfig()
caps = cfg.capacity


def pb(n):
    return PointBatch(xyz=jnp.zeros((n, 3), jnp.float32),
                      time=jnp.zeros((n,), jnp.float32),
                      mask=jnp.zeros((n,), bool))


fc = pb(caps.max_corner_ds)
fs = pb(caps.max_surface_ds)
mc = pb(caps.map_corner_capacity)
ms = pb(caps.map_surf_capacity)
q = jnp.array([1.0, 0, 0, 0], jnp.float32)
t = jnp.zeros(3, jnp.float32)
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
lowered = register_frame.lower(fc, fs, mc, ms, q, t, jnp.float32(0),
                               jnp.float32(0.1), jnp.bool_(True), key, cfg)
t1 = time.perf_counter()
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"lower: {t1 - t0:.1f}s  compile: {t2 - t1:.1f}s")
