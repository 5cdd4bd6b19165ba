"""URDF ingestion golden tests (VERDICT r2 item 2).

The catalog specs are exported to assets/*.urdf; parsing them back must
reproduce the exact model (round trip), and the parser's composite-rigid-body
lumping / inertial-frame rotation math is pinned against hand numpy.
Reference role: `mpc_controller/utils/dynamics.py:19-23` (Pinocchio URDF
load via get_robot_description).
"""
import os

import numpy as np
import pytest

from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.robots.go2 import go2_spec
from iterative_learning_nmpc_tpu.robots.solo12 import solo12_spec
from iterative_learning_nmpc_tpu.robots.urdf import (
    _rpy_to_matrix,
    parse_urdf,
    spec_to_urdf,
)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")

ARRAY_FIELDS = ("joint_axis", "joint_pos", "mass", "com", "inertia",
                "foot_offset", "torque_limit", "joint_limits", "q_home")


@pytest.mark.parametrize("make,asset", [
    (go2_spec, "go2.urdf"), (solo12_spec, "solo12.urdf")])
def test_roundtrip_matches_hand_spec(make, asset):
    spec = make()
    parsed = parse_urdf(spec_to_urdf(spec))
    assert parsed.parent == spec.parent
    assert parsed.jtype == spec.jtype
    assert parsed.foot_body == spec.foot_body
    for f in ARRAY_FIELDS:
        a = np.asarray(getattr(spec, f))
        b = np.asarray(getattr(parsed, f))
        if f == "q_home":
            # q_home is caller-supplied, not a URDF quantity; defaults differ
            continue
        assert np.abs(a - b).max() < 1e-6, f
    assert abs(float(parsed.foot_radius) - float(spec.foot_radius)) < 1e-9


def test_ingested_go2_drives_identical_dynamics():
    """go2_spec(urdf_path=assets/go2.urdf) must give bit-equal RNEA/FK to the
    hand table — the catalog can ship either path."""
    hand = go2_spec()
    ingested = go2_spec(urdf_path=os.path.join(ASSETS, "go2.urdf"))
    rng = np.random.default_rng(0)
    q = np.asarray(hand.q_home) + rng.normal(0, 0.2, 18).astype(np.float32)
    v = rng.normal(0, 0.5, 18).astype(np.float32)
    a = rng.normal(0, 1.0, 18).astype(np.float32)

    tau_h = np.asarray(dyn.rnea(hand, q, v, a))
    tau_i = np.asarray(dyn.rnea(ingested, q, v, a))
    assert np.abs(tau_h - tau_i).max() < 1e-5

    p_h = np.asarray(dyn.foot_positions(hand, q))
    p_i = np.asarray(dyn.foot_positions(ingested, q))
    assert np.abs(p_h - p_i).max() < 1e-6
    assert np.abs(np.asarray(hand.q_home) - np.asarray(ingested.q_home)).max() < 1e-6


def _leg_block(leg, sy, extra_calf=""):
    """Minimal leg: hip/thigh/calf revolute chain + fixed foot sphere."""
    l = leg.lower()
    return f"""
  <link name="{l}_hip">
    <inertial><origin xyz="0 {0.01*sy} 0" rpy="0 0 0"/>
      <mass value="0.5"/>
      <inertia ixx="1e-3" ixy="0" ixz="0" iyy="1e-3" iyz="0" izz="1e-3"/>
    </inertial>
  </link>
  <joint name="{l}_hip_joint" type="revolute">
    <parent link="trunk"/><child link="{l}_hip"/>
    <origin xyz="{0.2 if leg[0]=='F' else -0.2} {0.05*sy} 0" rpy="0 0 0"/>
    <axis xyz="1 0 0"/>
    <limit effort="20" velocity="30" lower="-1" upper="1"/>
  </joint>
  <link name="{l}_thigh">
    <inertial><origin xyz="0 0 -0.1" rpy="0 0 0"/>
      <mass value="1.0"/>
      <inertia ixx="5e-3" ixy="0" ixz="0" iyy="5e-3" iyz="0" izz="1e-3"/>
    </inertial>
  </link>
  <joint name="{l}_thigh_joint" type="revolute">
    <parent link="{l}_hip"/><child link="{l}_thigh"/>
    <origin xyz="0 {0.08*sy} 0" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit effort="20" velocity="30" lower="-2" upper="2"/>
  </joint>
  <link name="{l}_calf">{extra_calf if extra_calf else '''
    <inertial><origin xyz="0 0 -0.1" rpy="0 0 0"/>
      <mass value="0.2"/>
      <inertia ixx="1e-3" ixy="0" ixz="0" iyy="1e-3" iyz="0" izz="1e-4"/>
    </inertial>'''}
  </link>
  <joint name="{l}_calf_joint" type="revolute">
    <parent link="{l}_thigh"/><child link="{l}_calf"/>
    <origin xyz="0 0 -0.2" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit effort="30" velocity="30" lower="-2.7" upper="-0.8"/>
  </joint>
  <link name="{l}_foot">
    <inertial><origin xyz="0 0 0" rpy="0 0 0"/>
      <mass value="0.05"/>
      <inertia ixx="1e-5" ixy="0" ixz="0" iyy="1e-5" iyz="0" izz="1e-5"/>
    </inertial>
    <collision><geometry><sphere radius="0.02"/></geometry></collision>
  </link>
  <joint name="{l}_foot_joint" type="fixed">
    <parent link="{l}_calf"/><child link="{l}_foot"/>
    <origin xyz="0 0 -0.2" rpy="0 0 0"/>
  </joint>
"""


def _quad_urdf(trunk_extra="", calf_extra=""):
    legs = "".join(
        _leg_block(leg, 1.0 if leg.endswith("L") else -1.0,
                   extra_calf=calf_extra if leg == "FL" else "")
        for leg in ("FL", "FR", "RL", "RR"))
    return f"""<robot name="toy">
  <link name="trunk">
    <inertial><origin xyz="0.01 0 0" rpy="0 0 0"/>
      <mass value="5.0"/>
      <inertia ixx="0.02" ixy="0" ixz="0" iyy="0.08" iyz="0" izz="0.09"/>
    </inertial>
  </link>
  {trunk_extra}
  {legs}
</robot>"""


def test_fixed_link_lumping_matches_numpy():
    """A massy fixed payload on the trunk must lump by the composite-rigid-
    body formulas (weighted CoM + parallel-axis + frame rotation)."""
    payload = """
  <link name="payload">
    <inertial><origin xyz="0.01 0.02 0.03" rpy="0.3 -0.2 0.5"/>
      <mass value="2.0"/>
      <inertia ixx="0.004" ixy="1e-4" ixz="0" iyy="0.003" iyz="-2e-4" izz="0.002"/>
    </inertial>
  </link>
  <joint name="payload_joint" type="fixed">
    <parent link="trunk"/><child link="payload"/>
    <origin xyz="0.05 0 0.1" rpy="0.1 0.2 0.3"/>
  </joint>
"""
    spec = parse_urdf(_quad_urdf(trunk_extra=payload))

    # hand computation
    m1, c1 = 5.0, np.array([0.01, 0, 0.0])
    I1 = np.diag([0.02, 0.08, 0.09])
    Rj = _rpy_to_matrix([0.1, 0.2, 0.3])
    Ri = _rpy_to_matrix([0.3, -0.2, 0.5])
    m2 = 2.0
    c2_link = np.array([0.01, 0.02, 0.03])
    I2 = np.array([[0.004, 1e-4, 0], [1e-4, 0.003, -2e-4], [0, -2e-4, 0.002]])
    I2 = Ri @ I2 @ Ri.T                       # inertial frame -> payload frame
    c2 = np.array([0.05, 0, 0.1]) + Rj @ c2_link   # payload CoM in trunk frame
    I2 = Rj @ I2 @ Rj.T                       # payload frame -> trunk frame
    m = m1 + m2
    c = (m1 * c1 + m2 * c2) / m

    def shift(I, mm, d):
        return I + mm * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    I = shift(I1, m1, c1 - c) + shift(I2, m2, c2 - c)

    assert abs(float(spec.mass[5]) - m) < 1e-6
    assert np.abs(np.asarray(spec.com[5]) - c).max() < 1e-6
    assert np.abs(np.asarray(spec.inertia[5]) - I).max() < 1e-6
    # foot (0.05 kg at calf end) lumped into every calf: 0.2 + 0.05
    assert abs(float(spec.mass[8]) - 0.25) < 1e-6


def _vendor_leg(leg, mj_leg, sx, sy):
    """ANYmal/solo-style leg: rotated fixed mount frame ahead of the HAA,
    nonzero rpy on every movable joint origin, rotated inertial frames —
    the vendor-description features the round-3 parser rejected."""
    l = leg.lower()
    return f"""
  <link name="{l}_mount"/>
  <joint name="{l}_mount_joint" type="fixed">
    <parent link="base"/><child link="{l}_mount"/>
    <origin xyz="{0.2*sx} {0.05*sy} 0.01" rpy="0 0 {0.3*sx*sy}"/>
  </joint>
  <link name="{l}_hip_assembly">
    <inertial><origin xyz="0.01 {0.01*sy} 0" rpy="0.2 0 0.1"/>
      <mass value="0.5"/>
      <inertia ixx="1e-3" ixy="1e-5" ixz="0" iyy="1.2e-3" iyz="0" izz="9e-4"/>
    </inertial>
  </link>
  <joint name="{leg}_HAA" type="revolute">
    <parent link="{l}_mount"/><child link="{l}_hip_assembly"/>
    <origin xyz="0.02 0 0" rpy="0.1 -0.05 0"/>
    <axis xyz="1 0 0"/>
    <limit effort="20" velocity="30" lower="-1" upper="1"/>
  </joint>
  <link name="{l}_upper_leg">
    <inertial><origin xyz="0 0 -0.1" rpy="0 0.1 0"/>
      <mass value="1.0"/>
      <inertia ixx="5e-3" ixy="0" ixz="1e-4" iyy="5e-3" iyz="0" izz="1e-3"/>
    </inertial>
  </link>
  <joint name="{leg}_HFE" type="revolute">
    <parent link="{l}_hip_assembly"/><child link="{l}_upper_leg"/>
    <origin xyz="0 {0.08*sy} 0" rpy="0 0.2 0"/>
    <axis xyz="0 1 0"/>
    <limit effort="20" velocity="30" lower="-2" upper="2"/>
  </joint>
  <link name="{l}_lower_leg">
    <inertial><origin xyz="0 0 -0.1" rpy="0 0 0"/>
      <mass value="0.2"/>
      <inertia ixx="1e-3" ixy="0" ixz="0" iyy="1e-3" iyz="0" izz="1e-4"/>
    </inertial>
  </link>
  <joint name="{leg}_KFE" type="revolute">
    <parent link="{l}_upper_leg"/><child link="{l}_lower_leg"/>
    <origin xyz="0 0 -0.2" rpy="-0.15 0 0.05"/>
    <axis xyz="0 1 0"/>
    <limit effort="30" velocity="30" lower="-2.7" upper="-0.8"/>
  </joint>
  <link name="{leg}_FOOT">
    <collision><geometry><sphere radius="0.02"/></geometry></collision>
  </link>
  <joint name="{leg}_FOOT_joint" type="fixed">
    <parent link="{l}_lower_leg"/><child link="{leg}_FOOT"/>
    <origin xyz="0.01 0 -0.2" rpy="0 0 0"/>
  </joint>
"""


def _vendor_urdf_xml():
    blocks = "".join(
        _vendor_leg(leg, leg,
                    sx=(1.0 if leg[1] == "F" else -1.0),
                    sy=(1.0 if leg[0] == "L" else -1.0))
        for leg in ("LF", "RF", "LH", "RH"))
    return f"""<robot name="vendor_toy">
  <link name="base">
    <inertial><origin xyz="0.01 0 0.02" rpy="0.05 0 0"/>
      <mass value="5.0"/>
      <inertia ixx="0.02" ixy="0" ixz="1e-3" iyy="0.08" iyz="0" izz="0.09"/>
    </inertial>
  </link>
  {blocks}
</robot>"""


def test_vendor_style_urdf_rotated_frames_vs_mujoco():
    """VERDICT r3 item 7: a vendor-style URDF — rotated fixed mount frames
    ahead of movable joints, nonzero rpy on every movable joint origin,
    ANYmal-style LF_HAA/HFE/KFE naming, rotated inertials — must parse via
    residual-rotation folding and give FK that matches MuJoCo's own URDF
    importer (independent oracle) at random configurations."""
    import mujoco

    xml = _vendor_urdf_xml()
    spec = parse_urdf(xml)
    assert spec.nv == 18 and len(spec.parent) == 18

    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    order = [f"{leg}_{part}" for leg in ("LF", "RF", "LH", "RH")
             for part in ("HAA", "HFE", "KFE")]
    rng = np.random.default_rng(3)
    for _ in range(3):
        qj = rng.uniform(-0.6, 0.6, 12)
        # our chart: base(6)=0 (mj trunk is welded at origin), legs in
        # FEET_ORDER = FL,FR,RL,RR <-> vendor LF,RF,LH,RH
        q = np.zeros(18, np.float32)
        q[6:] = qj
        for i, jn in enumerate(order):
            adr = m.jnt_qposadr[mujoco.mj_name2id(
                m, mujoco.mjtObj.mjOBJ_JOINT, jn)]
            d.qpos[adr] = qj[i]
        mujoco.mj_forward(m, d)
        ours = np.asarray(dyn.foot_positions(spec, q))
        for i_leg, leg in enumerate(("lf", "rf", "lh", "rh")):
            # MuJoCo fuses the static FOOT body into the lower leg; the
            # foot sphere GEOM carries the foot point
            b = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY,
                                  f"{leg}_lower_leg")
            assert b >= 0
            gs = [g for g in range(m.ngeom)
                  if m.geom_bodyid[g] == b
                  and m.geom_type[g] == mujoco.mjtGeom.mjGEOM_SPHERE]
            assert len(gs) == 1
            assert np.abs(ours[i_leg] - d.geom_xpos[gs[0]]).max() < 1e-5, (
                leg, ours[i_leg], d.geom_xpos[gs[0]])

    # mass bookkeeping: MuJoCo merges the welded trunk into world (mass not
    # counted) and auto-densifies the inertial-less foot spheres (rho=1000),
    # so compare leg mass with those two accounted for
    sphere_m = 1000.0 * (4.0 / 3.0) * np.pi * 0.02**3
    ours_legs = float(np.asarray(spec.mass)[6:].sum())
    assert abs(ours_legs + 4 * sphere_m - float(m.body_mass.sum())) < 1e-4
    # and the parsed spec must be dynamics-ready
    tau = np.asarray(dyn.rnea(spec, np.asarray(spec.q_home),
                              np.zeros(18, np.float32),
                              np.zeros(18, np.float32)))
    assert np.isfinite(tau).all()


def test_structure_based_classification():
    """Joint names that defeat every alias still classify by tree
    structure + hip-origin signs."""
    xml = _quad_urdf()
    for leg in ("fl", "fr", "rl", "rr"):
        for part in ("hip", "thigh", "calf"):
            xml = xml.replace(f'name="{leg}_{part}_joint"',
                              f'name="{leg}{part}J"')  # no separators
    # joint names now unclassifiable by name ('flhipJ'), links keep names
    spec = parse_urdf(xml)
    ref = parse_urdf(_quad_urdf())
    assert np.abs(np.asarray(spec.joint_pos)
                  - np.asarray(ref.joint_pos)).max() < 1e-9
    assert np.abs(np.asarray(spec.mass) - np.asarray(ref.mass)).max() < 1e-9


def test_parsed_toy_spec_is_dynamics_ready():
    """The parsed toy quadruped must run FK/RNEA (shape + finiteness)."""
    spec = parse_urdf(_quad_urdf())
    q = np.asarray(spec.q_home)
    tau = np.asarray(dyn.rnea(spec, q, np.zeros(18, np.float32),
                              np.zeros(18, np.float32)))
    assert tau.shape == (18,) and np.isfinite(tau).all()
    p = np.asarray(dyn.foot_positions(spec, q))
    assert p.shape == (4, 3) and np.isfinite(p).all()


def test_mujoco_urdf_import_agrees_on_link_inertials():
    """Independent oracle on the XML reading: MuJoCo's own URDF importer
    must agree with parse_urdf on the leg-link inertials. (MuJoCo merges
    the root link into world and auto-densifies the inertial-less foot
    sphere, so trunk/calf are excluded — covered by the round-trip and
    lumping tests instead.)"""
    import mujoco

    spec = go2_spec()
    m = mujoco.MjModel.from_xml_string(spec_to_urdf(spec))
    for i_leg, leg in enumerate(("fl", "fr", "rl", "rr")):
        for k, part in enumerate(("hip", "thigh")):
            b = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY,
                                  f"{leg}_{part}")
            assert b >= 0
            body_idx = 6 + 3 * i_leg + k
            assert abs(m.body_mass[b] - float(spec.mass[body_idx])) < 1e-5
            # MuJoCo stores principal inertia; ours is diagonal already
            ours = np.sort(np.diag(np.asarray(spec.inertia[body_idx])))
            theirs = np.sort(np.asarray(m.body_inertia[b]))
            assert np.abs(ours - theirs).max() < 1e-7
            assert np.abs(m.body_ipos[b]
                          - np.asarray(spec.com[body_idx])).max() < 1e-6
