"""Micro-repro for layout-dependent reduction bits: compute the H/g
build from a fixed random (N,3,6) Jacobian + (N,3) residual in
(a) single-device and (b) 8-virtual-device sharded layouts, and diff
bits.  Iterate reduction strategies here instead of through the
9-frame pipeline."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from loam_livox_tpu.parallel import make_mesh
from loam_livox_tpu.registration import gauss_newton as gn

N = 1280
rng = np.random.default_rng(0)
J_host = rng.standard_normal((N, 3, 6)).astype(np.float32)
r_host = rng.standard_normal((N, 3)).astype(np.float32)
m_host = rng.random(N) < 0.9

mesh = make_mesh(8)
shard = NamedSharding(mesh, P("shard"))
rep = NamedSharding(mesh, P())


@jax.jit
def build(r0, J, mask):
    return gn._system_from_rJ(r0, J, mask, 0.5)


def run(sharded):
    if sharded:
        J = jax.device_put(J_host, shard)
        r = jax.device_put(r_host, shard)
        m = jax.device_put(m_host, shard)
    else:
        d = jax.devices()[0]
        J = jax.device_put(J_host, d)
        r = jax.device_put(r_host, d)
        m = jax.device_put(m_host, d)
    H, g = build(r, J, m)
    return np.asarray(H, np.float64), np.asarray(g, np.float64)


H1, g1 = run(False)
H8, g8 = run(True)
print("H max|Δ| =", np.abs(H1 - H8).max())
print("g max|Δ| =", np.abs(g1 - g8).max())

# also the plain invariant sum
@jax.jit
def s_only(x):
    return gn.shard_invariant_sum(x)

x_host = rng.standard_normal((N, 6)).astype(np.float32)
s1 = np.asarray(s_only(jax.device_put(x_host, jax.devices()[0])), np.float64)
s8 = np.asarray(s_only(jax.device_put(x_host, shard)), np.float64)
print("sum max|Δ| =", np.abs(s1 - s8).max())
