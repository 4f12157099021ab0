"""Pytree payload types flowing between pipeline stages.

These replace the reference's channel payload structs (``utility.h:64-80``:
``ProjectionOut`` / ``AssociationOut``) and the ``cloud_info`` ROS message
(``cloud_msgs/msg/cloud_info.msg``).  Dynamic ``pcl::PointCloud`` buffers
become fixed-capacity arrays + validity masks/counts — the shape discipline
XLA requires.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class RawScan:
    """One unordered input sweep (the ``/lidar_points`` payload)."""

    xyz: Array        # (P, 3) float32; padding rows arbitrary
    valid: Array      # (P,)  bool
    stamp: Array      # ()    float32 seconds


@struct.dataclass
class RangeImage:
    """Stage-1 output image set (V, H): the reference's ``_range_mat`` /
    ``_full_cloud`` (``imageProjection.cpp:178-224``)."""

    rng: Array        # (V, H) float32, +inf where empty
    xyz: Array        # (V, H, 3) float32
    valid: Array      # (V, H) bool
    ground: Array     # (V, H) bool
    label: Array      # (V, H) int32 segment label; -1 invalid/unsegmented
    start_orientation: Array  # () float32
    end_orientation: Array    # () float32


@struct.dataclass
class SegmentedCloud:
    """Per-ring compacted segmented cloud — the reference's flattened
    ``segmented_cloud`` + ``cloud_info`` metadata (``imageProjection.cpp:
    352-409``).  Shape (V, S): ring-major, compacted left, masked right."""

    xyz: Array        # (V, S, 3)
    rng: Array        # (V, S) range
    col: Array        # (V, S) int32 original column index
    is_ground: Array  # (V, S) bool
    valid: Array      # (V, S) bool
    count: Array      # (V,) int32 valid points per ring
    rel_time: Array   # (V, S) float32 intra-scan relative time in [0,1)


@struct.dataclass
class ProjectionOut:
    """Channel payload IP → FA (``utility.h:64-70``)."""

    segmented: SegmentedCloud
    outlier_xyz: Array      # (O, 3)
    outlier_valid: Array    # (O,)
    scan2d_xyz: Array       # (H, 3) virtual 2D scan points (chest height)
    scan2d_valid: Array     # (H,)
    stamp: Array


@struct.dataclass
class FeatureCloud:
    """A masked fixed-capacity feature point set."""

    xyz: Array        # (N, 3)
    ring: Array       # (N,) float32 (fractional rings allowed after deskew)
    rel_time: Array   # (N,)
    valid: Array      # (N,) bool

    @property
    def count(self) -> Array:
        return jnp.sum(self.valid.astype(jnp.int32))


@struct.dataclass
class FeatureSet:
    """Stage-2 feature extraction output (``featureAssociation.cpp:265-383``)."""

    sharp: FeatureCloud        # cornerPointsSharp     (label 2)
    less_sharp: FeatureCloud   # cornerPointsLessSharp (label 1)
    flat: FeatureCloud         # surfPointsFlat        (label -1)
    less_flat: FeatureCloud    # surfPointsLessFlat    (voxel-downsampled)


@struct.dataclass
class AssociationOut:
    """Channel payload FA → MO (``utility.h:73-80``): the last less-sharp /
    less-flat clouds de-skewed to scan end + integrated odometry."""

    corner_xyz: Array       # (C, 3)
    corner_valid: Array     # (C,)
    surf_xyz: Array         # (S, 3)
    surf_valid: Array       # (S,)
    outlier_xyz: Array      # (O, 3)
    outlier_valid: Array    # (O,)
    odom: Array             # (6,) pose in odom frame
    scan2d_xyz: Array       # (H, 3)
    scan2d_valid: Array     # (H,)
    stamp: Array


@struct.dataclass
class OdometryState:
    """Rolling state of the scan-to-scan odometry (stage 2)."""

    initialized: Array      # () bool
    transform_cur: Array    # (6,) last inter-scan motion (warm start)
    odom: Array             # (6,) integrated odometry pose
    last_corner: FeatureCloud
    last_surf: FeatureCloud
