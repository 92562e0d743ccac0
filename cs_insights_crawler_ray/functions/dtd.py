"""Minimal pure-Python DTD subset validator (SURVEY.md §2 S9).

The reference parses DBLP XML with ``lxml.etree.XMLParser(
dtd_validation=True)`` (reference ``dblpclient.py:472-479``); lxml is
absent in this sandbox, so validation is implemented directly for the
DTD subset DBLP's grammar actually uses:

- ``<!ENTITY % name "value">`` parameter entities (DBLP's ``%field;``),
  expanded textually in later declarations;
- ``<!ELEMENT name model>`` — the content model is reduced to the SET
  of allowed child element names plus ``EMPTY`` / ``ANY`` / ``#PCDATA``
  flags (element/attribute allow-lists; full content-model regex
  grammars are out of scope and unnecessary for DBLP);
- ``<!ATTLIST name attr type default ...>`` — allowed attribute names
  per element, with ``#REQUIRED`` tracked.

Validation walks an ``ElementTree`` subtree and returns a list of
error strings (empty = valid), so the parse stage can QUARANTINE
invalid elements as poison rows instead of crashing the run (the
reference hard-fails the whole document; SURVEY.md §2 S9 maps schema
violations to a quarantine sink).  With lxml installed the production
recipe in pipelines/dblp.py replaces this wholesale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class DTDSchema:
    # element -> allowed child tags (empty set for EMPTY/#PCDATA-only)
    children: dict[str, set[str]] = field(default_factory=dict)
    # element -> flags
    allows_pcdata: dict[str, bool] = field(default_factory=dict)
    allows_any: dict[str, bool] = field(default_factory=dict)
    is_empty: dict[str, bool] = field(default_factory=dict)
    # element -> attr -> required?
    attrs: dict[str, dict[str, bool]] = field(default_factory=dict)


_ENTITY_RE = re.compile(r"<!ENTITY\s+%\s+([\w.-]+)\s+\"([^\"]*)\"\s*>")
_ELEMENT_RE = re.compile(r"<!ELEMENT\s+([\w.-]+)\s+([^>]+)>")
_ATTLIST_RE = re.compile(r"<!ATTLIST\s+([\w.-]+)\s+([^>]+)>")
_NAME_RE = re.compile(r"[\w.-]+")
_PE_REF_RE = re.compile(r"%([\w.-]+);")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)


def parse_dtd(text: str) -> DTDSchema:
    """Parse the supported DTD subset into a DTDSchema."""
    text = _COMMENT_RE.sub(" ", text)
    # pass 1: parameter entities (may reference earlier entities)
    entities: dict[str, str] = {}

    def _expand(s: str) -> str:
        for _ in range(10):  # bounded nesting
            out = _PE_REF_RE.sub(lambda m: entities.get(m.group(1), ""), s)
            if out == s:
                return out
            s = out
        return s

    for m in _ENTITY_RE.finditer(text):
        entities[m.group(1)] = _expand(m.group(2))

    schema = DTDSchema()
    for m in _ELEMENT_RE.finditer(text):
        name, model = m.group(1), _expand(m.group(2)).strip()
        schema.is_empty[name] = model == "EMPTY"
        schema.allows_any[name] = model == "ANY"
        schema.allows_pcdata[name] = "#PCDATA" in model or model == "ANY"
        kids = set(_NAME_RE.findall(model)) - {"EMPTY", "ANY", "PCDATA"}
        schema.children[name] = kids

    for m in _ATTLIST_RE.finditer(text):
        name, body = m.group(1), _expand(m.group(2))
        # attlist body = repeated (attr type default) triples; defaults
        # are #REQUIRED | #IMPLIED | #FIXED "v" | "v"
        toks = re.findall(r"\"[^\"]*\"|\S+", body)
        attrs = schema.attrs.setdefault(name, {})
        i = 0
        while i + 1 < len(toks):
            attr = toks[i]
            i += 2  # skip type token (CDATA / ID / enumerations)
            required = False
            if i < len(toks):
                if toks[i] == "#REQUIRED":
                    required, i = True, i + 1
                elif toks[i] == "#IMPLIED":
                    i += 1
                elif toks[i] == "#FIXED":
                    i += 2
                elif toks[i].startswith('"'):
                    i += 1
            attrs[attr] = required
    return schema


def validate_element(el, schema: DTDSchema) -> list[str]:
    """Validate one element subtree; returns error strings (empty =
    valid).  Checks: declared tag, declared attributes, required
    attributes present, children allowed by the content model, EMPTY
    elements childless."""
    errs: list[str] = []
    _walk(el, schema, errs)
    return errs


def _walk(el, schema: DTDSchema, errs: list[str]) -> None:
    tag = el.tag
    if tag not in schema.children:
        errs.append(f"undeclared element <{tag}>")
        return  # children unknowable without a declaration
    declared = schema.attrs.get(tag, {})
    for a in el.attrib:
        if a not in declared:
            errs.append(f"undeclared attribute {a!r} on <{tag}>")
    for a, req in declared.items():
        if req and a not in el.attrib:
            errs.append(f"missing required attribute {a!r} on <{tag}>")
    if schema.is_empty.get(tag) and (len(el) or (el.text or "").strip()):
        errs.append(f"EMPTY element <{tag}> has content")
    if not schema.allows_any.get(tag):
        allowed = schema.children[tag]
        for c in el:
            if c.tag not in allowed:
                errs.append(f"child <{c.tag}> not allowed in <{tag}>")
    for c in el:
        _walk(c, schema, errs)
