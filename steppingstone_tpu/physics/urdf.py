"""URDF -> RobotModel, via the native C++ parser (native/urdf_loader.cpp).

Gives users the reference's "bring your own robot" path
(pybullet.loadURDF inside mocca_envs) without PyBullet: the C++ library
parses the XML; this wrapper orders the kinematic tree, merges fixed
joints (lumped inertia via the parallel-axis theorem), converts URDF
inertial conventions to the engine's (diagonal inertia about the CoM —
off-diagonal products are dropped with a warning), and emits a RobotModel
ready for `vmap`-ed simulation.

Limitations (documented): revolute/continuous/fixed joints only
(no prismatic/floating — the root is always a free joint); only sphere
collision geoms become contact points.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

from steppingstone_tpu.core import quaternion as qt  # noqa: F401 (doc link)
from steppingstone_tpu.physics.model import RobotModel

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "build", "liburdf_loader.so")

_lib = None


def _build_native():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, text=True
    )


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        _build_native()
    lib = ctypes.CDLL(_SO)
    lib.urdf_load.restype = ctypes.c_void_p
    lib.urdf_load.argtypes = [ctypes.c_char_p]
    lib.urdf_free.argtypes = [ctypes.c_void_p]
    lib.urdf_error.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.urdf_name.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.urdf_num_links.argtypes = [ctypes.c_void_p]
    lib.urdf_num_joints.argtypes = [ctypes.c_void_p]
    lib.urdf_link.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.urdf_link_num_spheres.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.urdf_link_sphere.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.urdf_joint.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def _rpy_to_quat(rpy):
    roll, pitch, yaw = rpy
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.array([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ])


def _quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def parse_urdf(xml: str) -> dict:
    """Parse URDF XML via the native library into plain dicts."""
    lib = _load_lib()
    h = lib.urdf_load(xml.encode())
    try:
        err = ctypes.create_string_buffer(512)
        if lib.urdf_error(h, err, 512):
            raise ValueError(f"URDF parse error: {err.value.decode()}")
        name_buf = ctypes.create_string_buffer(256)
        lib.urdf_name(h, name_buf, 256)

        links = {}
        link_order = []
        for i in range(lib.urdf_num_links(h)):
            rec = (ctypes.c_double * 13)()
            lib.urdf_link(h, i, name_buf, 256, rec)
            nm = name_buf.value.decode()
            spheres = []
            for s in range(lib.urdf_link_num_spheres(h, i)):
                sp = (ctypes.c_double * 4)()
                lib.urdf_link_sphere(h, i, s, sp)
                spheres.append(list(sp))
            links[nm] = dict(
                mass=rec[0], com=list(rec[1:4]), com_rpy=list(rec[4:7]),
                inertia=list(rec[7:13]), spheres=spheres,
            )
            link_order.append(nm)

        joints = []
        tbuf = ctypes.create_string_buffer(64)
        pbuf = ctypes.create_string_buffer(256)
        cbuf = ctypes.create_string_buffer(256)
        for i in range(lib.urdf_num_joints(h)):
            rec = (ctypes.c_double * 13)()
            lib.urdf_joint(h, i, name_buf, 256, tbuf, 64, pbuf, 256, cbuf, 256, rec)
            joints.append(dict(
                name=name_buf.value.decode(), type=tbuf.value.decode(),
                parent=pbuf.value.decode(), child=cbuf.value.decode(),
                xyz=list(rec[0:3]), rpy=list(rec[3:6]), axis=list(rec[6:9]),
                lower=rec[9], upper=rec[10], effort=rec[11], damping=rec[12],
            ))
        robot_name = None
        lib.urdf_name(h, name_buf, 256)
        robot_name = name_buf.value.decode()
        return dict(name=robot_name, links=links, link_order=link_order,
                    joints=joints)
    finally:
        lib.urdf_free(h)


def load_urdf(
    path_or_xml: str,
    root_height: float = 1.0,
    torque_limit_scale: float = 1.0,
    kp: float = 0.0,
    kd: float = 0.0,
) -> RobotModel:
    """Load a URDF file (or raw XML string) into a RobotModel."""
    if os.path.exists(path_or_xml):
        xml = open(path_or_xml).read()
    else:
        xml = path_or_xml
    raw = parse_urdf(xml)
    links, joints = raw["links"], raw["joints"]

    # root link = the one that is never a child
    children = {j["child"] for j in joints}
    roots = [n for n in raw["link_order"] if n not in children]
    if len(roots) != 1:
        raise ValueError(f"expected exactly one root link, got {roots}")
    root = roots[0]

    by_parent: dict = {}
    for j in joints:
        by_parent.setdefault(j["parent"], []).append(j)

    # Depth-first walk; fixed joints merge the child into the current
    # moving body (lumped mass + parallel-axis inertia, diagonal approx).
    bodies = []      # list of dicts accumulating RobotModel rows
    body_index = {}  # moving-link name -> body idx

    def lump(into: dict, link: dict, offset, rot_q):
        """Merge `link`'s inertial + spheres into body dict `into`,
        positioned at (offset, rot) in that body's frame."""
        m2 = link["mass"]
        if m2 <= 0 and not link["spheres"]:
            return
        R = _quat_mat(rot_q)
        com2 = np.asarray(offset) + R @ np.asarray(link["com"])
        m1 = into["mass"]
        com1 = np.asarray(into["com"])
        m = m1 + m2
        if m > 0:
            com = (m1 * com1 + m2 * com2) / m
        else:
            com = com1
        ixx, iyy, izz, ixy, ixz, iyz = link["inertia"]
        if abs(ixy) + abs(ixz) + abs(iyz) > 1e-8:
            warnings.warn(
                f"URDF link has inertia products; dropping off-diagonals"
            )
        I2 = R @ np.diag([ixx, iyy, izz]) @ R.T
        d2 = com2 - com
        d1 = com1 - com
        I_new = (
            np.diag(np.asarray(into["inertia"]))
            + m1 * (np.dot(d1, d1) * np.eye(3) - np.outer(d1, d1))
            + I2
            + m2 * (np.dot(d2, d2) * np.eye(3) - np.outer(d2, d2))
        )
        into["mass"] = m
        into["com"] = list(com)
        into["inertia"] = list(np.clip(np.diag(I_new), 1e-6, None))
        for sp in link["spheres"]:
            p = np.asarray(offset) + R @ np.asarray(sp[:3])
            into["spheres"].append([p[0], p[1], p[2], sp[3]])

    def new_body(name, link, parent_idx, joint=None):
        b = dict(
            name=name, mass=0.0, com=[0, 0, 0], inertia=[0, 0, 0],
            spheres=[], parent=parent_idx, joint=joint,
        )
        lump(b, link, np.zeros(3), np.array([1.0, 0, 0, 0]))
        bodies.append(b)
        body_index[name] = len(bodies) - 1
        return len(bodies) - 1

    def walk(link_name, body_idx, offset, rot_q):
        """Attach link_name's child joints; (offset, rot) locate link_name's
        frame within body `body_idx` (non-trivial after fixed-joint merges)."""
        for j in by_parent.get(link_name, []):
            child = j["child"]
            j_off = np.asarray(offset) + _quat_mat(rot_q) @ np.asarray(j["xyz"])
            j_rot = _quat_mul(rot_q, _rpy_to_quat(j["rpy"]))
            if j["type"] == "fixed":
                lump(bodies[body_idx], links[child], j_off, j_rot)
                walk(child, body_idx, j_off, j_rot)
            elif j["type"] in ("revolute", "continuous"):
                idx = new_body(child, links[child], body_idx,
                               joint=dict(j, anchor=list(j_off), rot=list(j_rot)))
                walk(child, idx, np.zeros(3), np.array([1.0, 0, 0, 0]))
            else:
                raise ValueError(
                    f"unsupported joint type {j['type']!r} ({j['name']})"
                )

    new_body(root, links[root], -1)
    walk(root, 0, np.zeros(3), np.array([1.0, 0, 0, 0]))

    nb = len(bodies)
    nj = nb - 1
    model = RobotModel(
        name=raw["name"],
        parent=np.array([b["parent"] for b in bodies], np.int32),
        joint_axis=np.array(
            [[0, 0, 1]] + [b["joint"]["axis"] for b in bodies[1:]], np.float32
        ),
        joint_anchor=np.array(
            [[0, 0, 0]] + [b["joint"]["anchor"] for b in bodies[1:]], np.float32
        ),
        joint_rot=np.array(
            [[1, 0, 0, 0]] + [b["joint"]["rot"] for b in bodies[1:]], np.float32
        ),
        mass=np.array([max(b["mass"], 1e-4) for b in bodies], np.float32),
        com=np.array([b["com"] for b in bodies], np.float32),
        inertia=np.array(
            [np.clip(b["inertia"], 1e-5, None) for b in bodies], np.float32
        ),
        joint_lower=np.array([b["joint"]["lower"] for b in bodies[1:]], np.float32),
        joint_upper=np.array([b["joint"]["upper"] for b in bodies[1:]], np.float32),
        joint_damping=np.array(
            [b["joint"]["damping"] for b in bodies[1:]], np.float32
        ),
        joint_stiffness=np.zeros(nj, np.float32),
        joint_spring_ref=np.zeros(nj, np.float32),
        actuated=np.ones(nj, bool),
        torque_limit=np.array(
            [b["joint"]["effort"] * torque_limit_scale for b in bodies[1:]],
            np.float32,
        ),
        kp=np.full(nj, kp, np.float32),
        kd=np.full(nj, kd, np.float32),
        contact_body=np.array(
            [i for i, b in enumerate(bodies) for _ in b["spheres"]], np.int32
        ),
        contact_offset=np.array(
            [sp[:3] for b in bodies for sp in b["spheres"]], np.float32
        ).reshape(-1, 3),
        contact_radius=np.array(
            [sp[3] for b in bodies for sp in b["spheres"]], np.float32
        ),
        foot_of_contact=np.array(
            [
                (0 if "right" in b["name"] else 1 if "left" in b["name"] else -1)
                if ("foot" in b["name"] or "toe" in b["name"]) else -1
                for b in bodies for _ in b["spheres"]
            ],
            np.int32,
        ),
        joint_names=tuple(b["name"] for b in bodies[1:]),
        body_names=tuple(b["name"] for b in bodies),
        init_q_joints=np.array(
            [np.clip(0.0, b["joint"]["lower"], b["joint"]["upper"])
             for b in bodies[1:]],
            np.float32,
        ),
        root_height=root_height,
    )
    return model
