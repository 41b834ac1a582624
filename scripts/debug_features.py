import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from loam_livox_tpu.core.config import SlamConfig
from loam_livox_tpu.io.simulator import LivoxSimulator, SimConfig
from loam_livox_tpu.frontend import livox as L

cfg = SlamConfig().replace(capacity={"max_raw_points": 8192})
fe = cfg.feature_extraction
sim = LivoxSimulator(SimConfig(points_per_frame=8192))
xyz, inten, t0 = sim.frame(0)
info, n_petals = L.extract_point_info(
    jnp.asarray(xyz), jnp.asarray(inten), jnp.ones((8192,), bool),
    jnp.float32(t0), fe, cfg.capacity)

pt_type = np.asarray(info.pt_type)
label = np.asarray(info.label)
curv = np.asarray(info.curvature)
va = np.asarray(info.view_angle)
depth = np.sqrt(np.asarray(info.depth_sq2))
print("petals:", int(n_petals))
print("pt_type hist: normal=%d zero=%d nan=%d near=%d lowrefl=%d edge=%d" % (
    (pt_type == 0).sum(), (pt_type & 1).astype(bool).sum(),
    (pt_type & 32).astype(bool).sum(), (pt_type & 2).astype(bool).sum(),
    (pt_type & 4).astype(bool).sum(), (pt_type & 16).astype(bool).sum()))
print("label: corner=%d surface=%d" % (
    (label & L.LABEL_CORNER).astype(bool).sum(),
    (label & L.LABEL_SURFACE).astype(bool).sum()))
ok = pt_type == 0
print("curvature quantiles (normal pts):",
      np.quantile(curv[ok], [0.5, 0.9, 0.99, 0.999]))
print("view angle quantiles:", np.quantile(va[ok], [0.1, 0.5, 0.9]))
print("depth quantiles:", np.quantile(depth[ok], [0.1, 0.5, 0.9]))

# where does the corner condition fail?
can = curv > fe.corner_curvature
print("curv>thr:", can.sum())
ang_ok = va > fe.minimum_view_angle
print("curv>thr & view:", (can & ang_ok).sum())
d2 = np.asarray(info.depth_sq2)
d_m2 = np.roll(d2, 2); d_p2 = np.roll(d2, -2)
local_min = (d2 <= d_m2) & (d2 <= d_p2)
no_jump = (np.abs(d2 - d_m2) < 0.1 * d2) | (np.abs(d2 - d_p2) < 0.1 * d2)
print("curv&view&localmin:", (can & ang_ok & local_min).sum())
print("curv&view&localmin&nojump:", (can & ang_ok & local_min & no_jump).sum())

surf = (curv < fe.surface_curvature) & ang_ok
print("surface cond:", surf.sum())
# typical spacing between consecutive points
sp = np.linalg.norm(np.diff(xyz, axis=0), axis=1)
print("consecutive spacing quantiles:", np.quantile(sp, [0.1, 0.5, 0.9]))
