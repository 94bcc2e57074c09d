"""Minimal `urdf_parser_py.urdf` API surface for running the reference.

Implements exactly the attributes the reference library reads
(`/root/reference/differentiable_robot_model/urdf_utils.py`):

- ``URDF.from_xml_file(path)``
- ``robot.links``  — document order; each with ``.name`` and ``.inertial``
  (``None`` when the URDF has no <inertial>, else ``.mass``,
  ``.origin.position`` and ``.inertia.ixx/.ixy/.ixz/.iyy/.iyz/.izz``)
- ``robot.joints`` — document order; each with ``.name``, ``.type``,
  ``.parent``, ``.child``, ``.origin.position`` (xyz),
  ``.origin.rotation`` (rpy), ``.axis``, ``.limit`` (``effort/lower/
  upper/velocity``) and ``.dynamics`` (``None`` when absent, so that
  ``joint.dynamics.damping`` raises AttributeError exactly like the real
  package — the reference catches that at urdf_utils.py:66-72).

Defaults follow the URDF spec / real urdf_parser_py: origin (0,0,0)/(0,0,0),
axis (1,0,0).
"""

import xml.etree.ElementTree as ET


def _floats(s, default):
    if s is None:
        return list(default)
    return [float(x) for x in s.split()]


class Pose:
    def __init__(self, xyz, rpy):
        self.position = xyz
        self.rotation = rpy
        self.xyz = xyz
        self.rpy = rpy


def _origin(el):
    o = el.find("origin") if el is not None else None
    if o is None:
        return Pose([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    return Pose(
        _floats(o.get("xyz"), (0.0, 0.0, 0.0)),
        _floats(o.get("rpy"), (0.0, 0.0, 0.0)),
    )


class Inertia:
    def __init__(self, el):
        for k in ("ixx", "ixy", "ixz", "iyy", "iyz", "izz"):
            setattr(self, k, float(el.get(k, 0.0)) if el is not None else 0.0)


class Inertial:
    def __init__(self, el):
        m = el.find("mass")
        self.mass = float(m.get("value", 0.0)) if m is not None else 0.0
        self.origin = _origin(el)
        self.inertia = Inertia(el.find("inertia"))


class Link:
    def __init__(self, el):
        self.name = el.get("name")
        ine = el.find("inertial")
        self.inertial = Inertial(ine) if ine is not None else None


class JointLimit:
    def __init__(self, el):
        self.effort = float(el.get("effort", 0.0)) if el is not None else 0.0
        self.lower = float(el.get("lower", 0.0)) if el is not None else 0.0
        self.upper = float(el.get("upper", 0.0)) if el is not None else 0.0
        self.velocity = (
            float(el.get("velocity", 0.0)) if el is not None else 0.0
        )


class JointDynamics:
    def __init__(self, el):
        self.damping = float(el.get("damping", 0.0))
        self.friction = float(el.get("friction", 0.0))


class Joint:
    def __init__(self, el):
        self.name = el.get("name")
        self.type = el.get("type")
        parent = el.find("parent")
        child = el.find("child")
        self.parent = parent.get("link") if parent is not None else None
        self.child = child.get("link") if child is not None else None
        self.origin = _origin(el)
        ax = el.find("axis")
        self.axis = _floats(
            ax.get("xyz") if ax is not None else None, (1.0, 0.0, 0.0)
        )
        lim = el.find("limit")
        self.limit = JointLimit(lim) if lim is not None else None
        dyn = el.find("dynamics")
        self.dynamics = JointDynamics(dyn) if dyn is not None else None


class URDF:
    def __init__(self, root):
        self.name = root.get("name")
        self.links = [Link(el) for el in root.findall("link")]
        self.joints = [Joint(el) for el in root.findall("joint")]

    @classmethod
    def from_xml_file(cls, path):
        return cls(ET.parse(path).getroot())

    @classmethod
    def from_xml_string(cls, s):
        return cls(ET.fromstring(s))
