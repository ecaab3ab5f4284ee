"""Stdlib XML-Schema validator for the vendored XES schema.

The environment has no lxml/xmlschema wheel, so pm4py-compatibility of the
XES sinks (the reference's downstream contract, app.py:216-217 →
example.ipynb cell 3) is proven by validating sink output against the
vendored IEEE 1849-2016 schema (``xes-ieee-1849-2016.xsd``) with this
interpreter. It is schema-DRIVEN, not a hard-coded XES checker: it parses
the XSD itself and enforces the constructs the XES schema uses —

* named ``xs:complexType`` with ``xs:sequence`` content,
* ``xs:complexContent``/``xs:extension`` (attribute + content inheritance),
* named ``xs:group`` holding an unbounded ``xs:choice`` of elements,
* ``xs:attribute`` with ``use="required"`` and built-in simple types
  (string, token, Name, NCName, anyURI, dateTime, long, double, boolean),
* element occurrence bounds inside sequences (minOccurs/maxOccurs).

Anything outside that subset raises ``NotImplementedError`` at schema load
(fail-loud: a schema edit that needs more XSD gets a clear signal, never a
silent pass). Validation is strict: undeclared child elements, undeclared
or missing-required attributes, type-invalid values, and out-of-order
sequence content are all errors.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from datetime import datetime

XS = "{http://www.w3.org/2001/XMLSchema}"

_NAME_RE = re.compile(r"^[A-Za-z_:][\w.\-:]*$")
_NCNAME_RE = re.compile(r"^[A-Za-z_][\w.\-]*$")
_LONG_RE = re.compile(r"^[+-]?\d+$")


def _v_string(v: str) -> bool:
    return True


def _v_token(v: str) -> bool:
    return v == v.strip() and not re.search(r"[\n\r\t]|  ", v)


def _v_name(v: str) -> bool:
    return bool(_NAME_RE.match(v))


def _v_ncname(v: str) -> bool:
    return bool(_NCNAME_RE.match(v))


def _v_long(v: str) -> bool:
    return bool(_LONG_RE.match(v)) and -(2**63) <= int(v) < 2**63


def _v_double(v: str) -> bool:
    if v in ("INF", "-INF", "NaN"):
        return True
    try:
        float(v)
        return True
    except ValueError:
        return False


def _v_boolean(v: str) -> bool:
    return v in ("true", "false", "1", "0")


def _v_datetime(v: str) -> bool:
    # xs:dateTime: ISO-8601 with optional fraction and optional zone.
    # Python's fromisoformat (3.11+) accepts exactly this lexical space,
    # including 'Z' and ±HH:MM offsets, and checks field validity.
    try:
        datetime.fromisoformat(v)
        return True
    except ValueError:
        return False


_SIMPLE_TYPES = {
    "xs:string": _v_string,
    "xs:anyURI": _v_string,
    "xs:token": _v_token,
    "xs:Name": _v_name,
    "xs:NCName": _v_ncname,
    "xs:ID": _v_ncname,
    "xs:long": _v_long,
    "xs:double": _v_double,
    "xs:boolean": _v_boolean,
    "xs:dateTime": _v_datetime,
}

_UNBOUNDED = float("inf")


@dataclass
class _Slot:
    """One particle of a sequence: a named element or a choice group."""

    kind: str  # "elem" | "choice"
    members: dict  # name -> type name
    min: float = 0
    max: float = _UNBOUNDED


@dataclass
class _CType:
    attrs: dict = field(default_factory=dict)  # name -> (simple type, required)
    slots: list = field(default_factory=list)


class XesValidationError(ValueError):
    pass


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _occurs(el) -> tuple[float, float]:
    lo = int(el.get("minOccurs", "1"))
    hi_raw = el.get("maxOccurs", "1")
    hi = _UNBOUNDED if hi_raw == "unbounded" else int(hi_raw)
    return lo, hi


class XsdSchema:
    """A loaded XSD (the subset in the module docstring)."""

    def __init__(self, xsd_path: str):
        root = ET.parse(xsd_path).getroot()
        self.target_ns = root.get("targetNamespace", "")
        self._groups: dict[str, dict] = {}
        self._raw_types: dict[str, ET.Element] = {}
        self._types: dict[str, _CType] = {}
        self.top_elements: dict[str, str] = {}
        for child in root:
            tag = _local(child.tag)
            if tag == "group":
                self._groups[child.get("name")] = self._parse_group(child)
            elif tag == "complexType":
                self._raw_types[child.get("name")] = child
            elif tag == "element":
                self.top_elements[child.get("name")] = self._strip(child.get("type"))
            else:
                raise NotImplementedError(f"unsupported top-level xsd construct: {tag}")
        for name in self._raw_types:
            self._resolve(name)

    @staticmethod
    def _strip(qname: str) -> str:
        return qname.split(":", 1)[-1] if qname else qname

    def _parse_group(self, group_el) -> dict:
        (choice,) = list(group_el)
        if _local(choice.tag) != "choice":
            raise NotImplementedError("only choice groups are supported")
        members = {}
        for el in choice:
            if _local(el.tag) != "element":
                raise NotImplementedError("only element members in choice groups")
            members[el.get("name")] = self._strip(el.get("type"))
        return members

    def _parse_sequence(self, seq_el) -> list:
        slots: list[_Slot] = []
        for item in seq_el:
            tag = _local(item.tag)
            if tag == "element":
                lo, hi = _occurs(item)
                slots.append(
                    _Slot("elem", {item.get("name"): self._strip(item.get("type"))}, lo, hi)
                )
            elif tag == "group":
                ref = self._strip(item.get("ref"))
                slots.append(_Slot("choice", dict(self._groups[ref]), 0, _UNBOUNDED))
            else:
                raise NotImplementedError(f"unsupported sequence particle: {tag}")
        return slots

    def _resolve(self, name: str) -> _CType:
        if name in self._types:
            return self._types[name]
        el = self._raw_types[name]
        ct = _CType()
        for child in el:
            tag = _local(child.tag)
            if tag == "sequence":
                ct.slots.extend(self._parse_sequence(child))
            elif tag == "attribute":
                ct.attrs[child.get("name")] = (
                    child.get("type"),
                    child.get("use") == "required",
                )
            elif tag == "complexContent":
                (ext,) = list(child)
                if _local(ext.tag) != "extension":
                    raise NotImplementedError("only extension derivation is supported")
                base = self._resolve(self._strip(ext.get("base")))
                ct.slots.extend(base.slots)  # base content first (XSD extension rule)
                ct.attrs.update(base.attrs)
                for sub in ext:
                    stag = _local(sub.tag)
                    if stag == "sequence":
                        ct.slots.extend(self._parse_sequence(sub))
                    elif stag == "attribute":
                        ct.attrs[sub.get("name")] = (
                            sub.get("type"),
                            sub.get("use") == "required",
                        )
                    else:
                        raise NotImplementedError(f"unsupported extension child: {stag}")
            else:
                raise NotImplementedError(f"unsupported complexType child: {tag}")
        self._types[name] = ct
        return ct

    # ------------------------------------------------------------------ #
    # validation
    # ------------------------------------------------------------------ #

    def iter_errors(self, root: ET.Element):
        ns, name = (root.tag[1:].rsplit("}", 1) + [""])[:2] if root.tag.startswith("{") else ("", root.tag)
        if ns != self.target_ns:
            yield f"/{name}: element namespace {ns!r} != targetNamespace {self.target_ns!r}"
            return
        if name not in self.top_elements:
            yield f"/{name}: not a declared top-level element"
            return
        yield from self._validate_element(root, self.top_elements[name], f"/{name}")

    def _validate_element(self, el: ET.Element, type_name: str, path: str):
        ct = self._types[type_name]
        seen = set()
        for attr, raw in el.attrib.items():
            if attr.startswith("{"):  # foreign-namespace attr (e.g. xsi:*)
                continue
            if attr not in ct.attrs:
                yield f"{path}: undeclared attribute {attr!r}"
                continue
            seen.add(attr)
            stype = ct.attrs[attr][0]
            if not _SIMPLE_TYPES[stype](raw):
                yield f"{path}/@{attr}: {raw!r} is not a valid {stype}"
        for attr, (_stype, required) in ct.attrs.items():
            if required and attr not in seen:
                yield f"{path}: missing required attribute {attr!r}"
        if el.text and el.text.strip():
            yield f"{path}: unexpected text content {el.text.strip()[:40]!r}"
        # greedy left-to-right sequence matching
        i, count = 0, 0
        counters = {}
        for child in el:
            cns, cname = (
                (child.tag[1:].rsplit("}", 1) + [""])[:2]
                if child.tag.startswith("{")
                else ("", child.tag)
            )
            cpath = f"{path}/{cname}"
            if cns != self.target_ns:
                yield f"{cpath}: element namespace {cns!r} != targetNamespace"
                continue
            while i < len(ct.slots) and (
                cname not in ct.slots[i].members or counters.get(i, 0) >= ct.slots[i].max
            ):
                if counters.get(i, 0) < ct.slots[i].min:
                    yield (
                        f"{path}: content model violated — "
                        f"{sorted(ct.slots[i].members)} required before <{cname}>"
                    )
                i += 1
                count = 0
            if i >= len(ct.slots):
                yield f"{cpath}: element not allowed here (out of order or undeclared)"
                continue
            counters[i] = counters.get(i, 0) + 1
            yield from self._validate_element(child, ct.slots[i].members[cname], cpath)
        for j in range(i, len(ct.slots)):
            if counters.get(j, 0) < ct.slots[j].min:
                yield f"{path}: missing required child {sorted(ct.slots[j].members)}"

    def validate(self, xml_path_or_string: str) -> None:
        """Raise XesValidationError listing EVERY violation; None when valid."""
        if xml_path_or_string.lstrip().startswith("<"):
            root = ET.fromstring(xml_path_or_string)
        else:
            root = ET.parse(xml_path_or_string).getroot()
        errors = list(self.iter_errors(root))
        if errors:
            raise XesValidationError(
                f"{len(errors)} schema violation(s):\n  " + "\n  ".join(errors)
            )


def xes_schema() -> XsdSchema:
    """The vendored IEEE 1849-2016 XES schema, loaded."""
    import os

    return XsdSchema(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "xes-ieee-1849-2016.xsd")
    )
