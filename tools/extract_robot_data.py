"""Regenerate the bundled robot_data/ URDFs from an upstream description set.

The framework bundles compact, canonical URDFs containing only what the
dynamics consumes (<link><inertial>, <joint> origin/axis/limit/dynamics) —
visual/collision geometry, materials and meshes are dropped, since this
framework has no renderer and the dynamics never reads them (the reference
only uses meshes for pybullet visualization).

Usage:
    python tools/extract_robot_data.py /root/reference/diff_robot_data

The physical constants (masses, inertias, joint frames) originate from the
public robot description packages (KUKA iiwa, Franka Panda, Allegro, Fetch,
Kinova Jaco, TriFinger) redistributed by the reference under its MIT license.
"""

from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

# (relative source path, output name)
ROBOTS = [
    ("2link_robot.urdf", "2link_robot.urdf"),
    ("kuka_iiwa/urdf/iiwa7.urdf", "kuka_iiwa_iiwa7.urdf"),
    ("kuka_iiwa/urdf/iiwa7_allegro.urdf", "kuka_iiwa7_allegro.urdf"),
    ("panda_description/urdf/panda_no_gripper.urdf", "panda_no_gripper.urdf"),
    ("allegro/urdf/allegro_hand_description_left.urdf", "allegro_hand_left.urdf"),
    ("trifinger_edu_description/trifinger_edu.urdf", "trifinger_edu.urdf"),
    ("fetch_description/urdf/fetch_arm_no_gripper.urdf", "fetch_arm_no_gripper.urdf"),
    (
        "fetch_description/urdf/fetch_arm_no_gripper_small_damping.urdf",
        "fetch_arm_no_gripper_small_damping.urdf",
    ),
    ("kinova_description/urdf/jaco_clean.urdf", "kinova_jaco.urdf"),
    ("kinova_description/urdf/jaco.urdf", "kinova_jaco_full.urdf"),
    ("panda_description/urdf/panda.urdf", "panda_with_gripper.urdf"),
    ("fetch_description/urdf/fetch.urdf", "fetch_full.urdf"),
    (
        "allegro/urdf/allegro_hand_description_left_small_damping.urdf",
        "allegro_hand_left_small_damping.urdf",
    ),
]

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "differentiable_robot_model_tpu",
    "robot_data",
)


def _fmt(x: float) -> str:
    return repr(float(x)) if x != int(x) else str(int(x))


def extract(src_path: str, dst_path: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from differentiable_robot_model_tpu.models.urdf import parse_xml_lenient

    src = parse_xml_lenient(src_path)
    out = ET.Element("robot", {"name": src.get("name", "robot")})

    for link in src.findall("link"):
        lo = ET.SubElement(out, "link", {"name": link.get("name")})
        inertial = link.find("inertial")
        if inertial is not None:
            io = ET.SubElement(lo, "inertial")
            origin = inertial.find("origin")
            if origin is not None:
                ET.SubElement(
                    io,
                    "origin",
                    {
                        "xyz": origin.get("xyz", "0 0 0"),
                        "rpy": origin.get("rpy", "0 0 0"),
                    },
                )
            m = inertial.find("mass")
            if m is not None:
                ET.SubElement(io, "mass", {"value": m.get("value", "1")})
            ine = inertial.find("inertia")
            if ine is not None:
                ET.SubElement(
                    io,
                    "inertia",
                    {
                        k: ine.get(k, "0")
                        for k in ("ixx", "ixy", "ixz", "iyy", "iyz", "izz")
                    },
                )

    for joint in src.findall("joint"):
        jo = ET.SubElement(
            out, "joint", {"name": joint.get("name"), "type": joint.get("type")}
        )
        for tag in ("origin", "parent", "child", "axis", "limit", "dynamics"):
            el = joint.find(tag)
            if el is not None:
                ET.SubElement(jo, tag, dict(el.attrib))

    ET.indent(out)
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    ET.ElementTree(out).write(dst_path, xml_declaration=True, encoding="unicode")
    print(f"wrote {dst_path}")


def main() -> None:
    src_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/diff_robot_data"
    for rel, out_name in ROBOTS:
        src = os.path.join(src_root, rel)
        if not os.path.exists(src):
            print(f"skip (missing): {src}")
            continue
        extract(src, os.path.join(OUT_DIR, out_name))


if __name__ == "__main__":
    main()
