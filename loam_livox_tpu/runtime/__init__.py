"""Runtime: the functional re-design of the reference's thread-and-mutex
mapping node scheduler (reference: ``source/laser_mapping.hpp``)."""
from .odometry import OdometryState, init_state, odometry_step  # noqa: F401
from .pipeline import OdometryPipeline, run_odometry  # noqa: F401
