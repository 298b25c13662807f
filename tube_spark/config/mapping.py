"""The mapping language: typed dataclasses + parser.

This is the engine's "query language" front-end — the same declarative
surface as the reference's etlMapping.yaml (two mapping types,
``aggregator`` and ``collector``), parsed into plain dataclasses the
plan compiler consumes.  Replaces the reference's string-churning
parsers (``tube/etl/indexers/aggregation/parser.py``,
``injection/parser.py``) with a single grammar module; semantics are
preserved, implementation is new.

Grammar cheat-sheet (see reference docs/configuration_file.md):

* ``props``:            ``[{name, src?, fn?, value_mappings?}]`` — root props.
* ``parent_props``:     ``[{path: "a[p1,alias:p2].b[p3]"}]`` — ancestor walk.
* ``flatten_props``:    ``[{path, props, sorted_by: "col, desc"?}]`` — child
                        props pulled onto the root row (top-1 when sorted).
* ``aggregated_props``: ``[{name, src?, path: "a.b.c", fn}]`` with
                        ``fn ∈ {count,sum,min,max,set,list,first,sorted_list}``
                        (sorted_list = engine extension: deterministic list).
* ``nested_props``:     recursive ``[{name, path, props, filter?, nested_props?}]``.
* ``joining_props``:    ``[{index, join_on, props: [{name, src, fn}]}]``.
* ``injecting_props``:  ``{node_label: {props: [...]}}`` (collector only).
* ``filter``:           ``{op, prop, value}`` leaves, ``{op: and|or,
                        logics: [...]}`` compounds (reference
                        ``tube/etl/indexers/base/logic.py:4-109``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

AGG_FNS = {"count", "sum", "min", "max", "set", "list", "first", "sorted_list"}


@dataclass(frozen=True)
class PropSpec:
    """One output property: ``name`` in the document, ``src`` in the node.

    ``value_mappings`` decodes raw values to display values
    (e.g. ``f → Female``); unmapped values pass through unchanged.
    """

    name: str
    src: str | None = None
    fn: str | None = None
    value_mappings: tuple[tuple[str, str], ...] = ()

    @property
    def source(self) -> str:
        return self.src or self.name


@dataclass(frozen=True)
class PathStep:
    """One hop of a parent/child path: target node label + props to fetch."""

    label: str
    props: tuple[PropSpec, ...] = ()


@dataclass(frozen=True)
class ParentPath:
    """``parent_props`` entry: walk up ancestors collecting props per level."""

    steps: tuple[PathStep, ...]


@dataclass(frozen=True)
class FlattenProp:
    """``flatten_props`` entry: child node props flattened onto the root.

    When the relation is one-to-many, ``sorted_by`` picks the single row
    per root (top-1 by ``sort_col`` asc/desc); without it a many-to-many
    flatten is rejected (the reference guards this the same way,
    ``aggregation/parser.py:380-408``).
    """

    path: tuple[str, ...]
    props: tuple[PropSpec, ...]
    sort_col: str | None = None
    desc: bool = True


@dataclass(frozen=True)
class AggregatedProp:
    """``aggregated_props`` entry: aggregate over a multi-hop child path."""

    name: str
    path: tuple[str, ...]
    fn: str
    src: str | None = None

    def __post_init__(self) -> None:
        if self.fn not in AGG_FNS:
            raise ValueError(f"unknown fn {self.fn!r}; expected one of {sorted(AGG_FNS)}")


@dataclass(frozen=True)
class FilterNode:
    """Filter AST node. Leaf: (op, prop, value). Compound: op and/or + children."""

    op: str
    prop: str | None = None
    value: Any = None
    children: tuple[FilterNode, ...] = ()

    @property
    def is_compound(self) -> bool:
        return self.op in ("and", "or")


@dataclass(frozen=True)
class NestedProp:
    """``nested_props`` entry: array-of-struct sub-documents, recursive."""

    name: str
    path: tuple[str, ...]
    props: tuple[PropSpec, ...]
    filter: FilterNode | None = None
    children: tuple[NestedProp, ...] = ()


@dataclass(frozen=True)
class JoiningProp:
    """``joining_props`` entry: cross-index join on shared key(s)."""

    index: str
    join_on: str
    props: tuple[PropSpec, ...]


@dataclass(frozen=True)
class InjectingProps:
    """Collector: props of an ancestor node injected into every leaf doc."""

    node: str
    props: tuple[PropSpec, ...]


@dataclass(frozen=True)
class Mapping:
    name: str
    doc_type: str
    type: str  # "aggregator" | "collector"
    root: str | None = None  # aggregator
    category: str = "data_file"  # collector
    props: tuple[PropSpec, ...] = ()
    parent_props: tuple[ParentPath, ...] = ()
    flatten_props: tuple[FlattenProp, ...] = ()
    aggregated_props: tuple[AggregatedProp, ...] = ()
    nested_props: tuple[NestedProp, ...] = ()
    joining_props: tuple[JoiningProp, ...] = ()
    injecting_props: tuple[InjectingProps, ...] = ()
    filter: FilterNode | None = None


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------

_PARENT_STEP_RE = re.compile(r"^(?P<label>[A-Za-z0-9_]+)(?:\[(?P<props>[^\]]*)\])?$")


def _parse_prop_entry(entry: Any) -> PropSpec:
    if isinstance(entry, str):
        return _parse_prop_token(entry)
    vm: list[tuple[str, str]] = []
    for m in entry.get("value_mappings", []) or []:
        if isinstance(m, dict):
            vm.extend((str(k), str(v)) for k, v in m.items())
    return PropSpec(
        name=entry["name"],
        src=entry.get("src"),
        fn=entry.get("fn"),
        value_mappings=tuple(vm),
    )


def _parse_prop_token(token: str) -> PropSpec:
    """``alias:src`` or plain ``name`` tokens inside path brackets."""
    token = token.strip()
    if ":" in token:
        alias, src = (t.strip() for t in token.split(":", 1))
        return PropSpec(name=alias, src=src)
    return PropSpec(name=token)


def parse_parent_path(path: str) -> ParentPath:
    """``centers[country,center_name:name].projects[data_type]`` →  steps."""
    steps = []
    for raw in path.split("."):
        m = _PARENT_STEP_RE.match(raw.strip())
        if not m:
            raise ValueError(f"bad parent_props path step: {raw!r} in {path!r}")
        props = tuple(
            _parse_prop_token(t) for t in (m.group("props") or "").split(",") if t.strip()
        )
        steps.append(PathStep(label=m.group("label"), props=props))
    return ParentPath(steps=tuple(steps))


def parse_sorted_by(raw: str | None) -> tuple[str | None, bool]:
    """``"age_at_visit, desc"`` → ("age_at_visit", True); default desc."""
    if not raw:
        return None, True
    parts = [p.strip() for p in raw.split(",")]
    col = parts[0]
    desc = True
    if len(parts) > 1:
        desc = parts[1].lower() != "asc"
    return col, desc


def parse_filter(raw: dict[str, Any] | None) -> FilterNode | None:
    if raw is None:
        return None
    op = str(raw["op"]).lower()
    if op in ("and", "or"):
        return FilterNode(
            op=op, children=tuple(parse_filter(c) for c in raw["logics"])
        )
    return FilterNode(op=op, prop=raw["prop"], value=raw.get("value"))


def _parse_nested(entry: dict[str, Any]) -> NestedProp:
    return NestedProp(
        name=entry["name"],
        path=tuple(entry["path"].split(".")),
        props=tuple(_parse_prop_entry(p) for p in entry.get("props", []) or []),
        filter=parse_filter(entry.get("filter")),
        children=tuple(_parse_nested(c) for c in entry.get("nested_props", []) or []),
    )


def parse_mapping(raw: dict[str, Any]) -> Mapping:
    mtype = raw.get("type", "aggregator")
    flatten = []
    for f in raw.get("flatten_props", []) or []:
        sort_col, desc = parse_sorted_by(f.get("sorted_by"))
        flatten.append(
            FlattenProp(
                path=tuple(f["path"].split(".")),
                props=tuple(_parse_prop_entry(p) for p in f.get("props", []) or []),
                sort_col=sort_col,
                desc=desc,
            )
        )
    aggs = [
        AggregatedProp(
            name=a["name"],
            path=tuple(a["path"].split(".")),
            fn=a["fn"],
            src=a.get("src"),
        )
        for a in raw.get("aggregated_props", []) or []
    ]
    joining = [
        JoiningProp(
            index=j["index"] if "index" in j else j["joining_index"],
            join_on=j["join_on"],
            props=tuple(_parse_prop_entry(p) for p in j.get("props", []) or []),
        )
        for j in raw.get("joining_props", []) or []
    ]
    injecting = [
        InjectingProps(
            node=node,
            props=tuple(_parse_prop_entry(p) for p in (spec or {}).get("props", []) or []),
        )
        for node, spec in (raw.get("injecting_props") or {}).items()
    ]
    return Mapping(
        name=raw["name"],
        doc_type=raw.get("doc_type", raw["name"]),
        type=mtype,
        root=raw.get("root"),
        category=raw.get("category", "data_file"),
        props=tuple(_parse_prop_entry(p) for p in raw.get("props", []) or []),
        parent_props=tuple(
            parse_parent_path(p["path"]) for p in raw.get("parent_props", []) or []
        ),
        flatten_props=tuple(flatten),
        aggregated_props=tuple(aggs),
        nested_props=tuple(_parse_nested(n) for n in raw.get("nested_props", []) or []),
        joining_props=tuple(joining),
        injecting_props=tuple(injecting),
        filter=parse_filter(raw.get("filter")),
    )


def parse_mappings_yaml(text: str) -> list[Mapping]:
    import yaml

    doc = yaml.safe_load(text)
    return [parse_mapping(m) for m in doc.get("mappings", [])]
