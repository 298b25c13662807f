"""Data-dictionary abstraction: node schemas + graph links.

Replaces the reference's coupled pair of (JSON-Schema data dictionary +
psqlgraph ORM model) (``tube/utils/dd.py:4-94``) with one pure-Python
structure: per-node property types and child→parent links with
multiplicity.  From it the engine derives Spark ``StructType`` schemas
for ``from_json`` parsing and the link metadata that drives joins.

Type system (reference semantics, ``tube/etl/indexers/base/parser.py``):

* JSON-Schema types map to engine types; a prop may carry several
  candidate types (``anyOf``/``oneOf``) and the *widest* wins:
  ``number > integer > boolean > string`` (``base/parser.py:126-135``).
* ``enum`` → string (``base/parser.py:191-193``); arrays carry an item
  type (``base/parser.py:203-207``).
* Divergences from the reference, on purpose (documented, not copied):
  - ``number`` → DoubleType (reference used FloatType,
    ``tube/utils/spark.py:108-117``) — doubles survive aggregation at
    100 TB without precision collapse and match ANSI SQL engines.
  - ``boolean`` → BooleanType (the reference silently degrades bools to
    strings, ``utils/spark.py:100-107``); set
    ``legacy_bool_as_string=True`` for bug-compatible output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# widest-type precedence: higher wins (reference base/parser.py:126-135)
_WIDTH = {"number": 3, "integer": 2, "boolean": 1, "string": 0}


@dataclass(frozen=True)
class PropType:
    """Engine-level property type: a scalar kind, or array-of-kind."""

    kind: str  # "string" | "integer" | "number" | "boolean" | "array"
    item: str | None = None  # element kind when kind == "array"

    def spark_type(self, legacy_bool_as_string: bool = False) -> T.DataType:
        return _to_spark(self.kind, self.item, legacy_bool_as_string)


def _scalar_spark(kind: str, legacy_bool_as_string: bool) -> T.DataType:
    if kind == "number":
        return T.DoubleType()
    if kind == "integer":
        return T.LongType()
    if kind == "boolean":
        return T.StringType() if legacy_bool_as_string else T.BooleanType()
    return T.StringType()


def _to_spark(kind: str, item: str | None, legacy_bool_as_string: bool) -> T.DataType:
    if kind == "array":
        return T.ArrayType(_scalar_spark(item or "string", legacy_bool_as_string))
    return _scalar_spark(kind, legacy_bool_as_string)


def widest(kinds: list[str]) -> str:
    """Resolve a set of candidate scalar kinds to the widest one."""
    return max(kinds, key=lambda k: _WIDTH.get(k, -1))


def prop_type_from_schema(schema: dict) -> PropType:
    """JSON-Schema fragment → PropType (anyOf/oneOf/enum resolution)."""
    if "enum" in schema:
        return PropType("string")
    alts = schema.get("anyOf") or schema.get("oneOf")
    if alts:
        kinds = []
        for alt in alts:
            t = alt.get("type")
            if isinstance(t, list):
                kinds.extend(x for x in t if x != "null")
            elif t and t != "null":
                kinds.append(t)
        kinds = [k for k in kinds if k != "array"] or ["string"]
        return PropType(widest(kinds))
    t = schema.get("type", "string")
    if isinstance(t, list):
        t = widest([x for x in t if x != "null"] or ["string"])
    if t == "array":
        item = schema.get("items", {}).get("type", "string")
        return PropType("array", item=item)
    return PropType(t if t in _WIDTH else "string")


@dataclass(frozen=True)
class Link:
    """Child→parent edge class. ``edge`` names the physical edge table
    (sans ``edge_`` prefix); ``multiplicity`` ∈ one_to_one / many_to_one /
    one_to_many / many_to_many (child-relative-to-parent).

    ``name`` is how the CHILD's schema refers to its parents (link
    ``name``, e.g. ``participants``); ``backref`` is how the PARENT
    refers to its children (e.g. ``demographics`` for node
    ``demographic_baseline``).  Mapping paths use these, not labels —
    the reference resolves them through its ORM backrefs
    (``tube/utils/dd.py:19-94``)."""

    child: str
    parent: str
    edge: str
    multiplicity: str = "many_to_one"
    name: str | None = None
    backref: str | None = None

    @property
    def child_unique(self) -> bool:
        """True when each child row links to at most one parent."""
        return self.multiplicity in ("one_to_one", "many_to_one")

    @property
    def parent_unique(self) -> bool:
        """True when each parent has at most one child row on this link."""
        return self.multiplicity in ("one_to_one", "one_to_many")


@dataclass
class NodeDef:
    label: str
    props: dict[str, PropType] = field(default_factory=dict)
    category: str | None = None


class Dictionary:
    """Graph metadata: nodes, typed props, child→parent links."""

    def __init__(self, nodes: list[NodeDef], links: list[Link]):
        self.nodes: dict[str, NodeDef] = {n.label: n for n in nodes}
        self.links: list[Link] = list(links)
        self._by_child: dict[str, list[Link]] = {}
        self._by_parent: dict[str, list[Link]] = {}
        for l in links:
            self._by_child.setdefault(l.child, []).append(l)
            self._by_parent.setdefault(l.parent, []).append(l)

    # --- schema -----------------------------------------------------------
    def props_schema(
        self, label: str, only: list[str] | None = None, legacy_bool_as_string: bool = False
    ) -> T.StructType:
        """StructType for a node's ``_props`` JSON (optionally pruned).

        Pruning before ``from_json`` matters: parsing 5 fields out of a
        200-field JSON blob is dramatically cheaper and Catalyst cannot
        prune inside a JSON parse for us.
        """
        node = self.nodes[label]
        names = only if only is not None else list(node.props)
        fields = [
            T.StructField(n, node.props[n].spark_type(legacy_bool_as_string), True)
            for n in names
            if n in node.props
        ]
        return T.StructType(fields)

    def prop_type(self, label: str, prop: str) -> PropType | None:
        return self.nodes[label].props.get(prop)

    # --- graph walks ------------------------------------------------------
    def parents_of(self, label: str) -> list[Link]:
        return self._by_child.get(label, [])

    def children_of(self, label: str) -> list[Link]:
        return self._by_parent.get(label, [])

    def link_between(self, child: str, parent: str) -> Link:
        for l in self._by_child.get(child, []):
            if l.parent == parent:
                return l
        raise KeyError(f"no link {child} -> {parent}")

    def nodes_in_category(self, category: str) -> list[str]:
        return [n.label for n in self.nodes.values() if n.category == category]

    def resolve_step(self, current: str, step: str) -> tuple[str, Link, bool]:
        """Resolve a path step (node label, or a plural-ish alias) from
        ``current`` to a neighbor.  Returns (label, link, is_child) where
        ``is_child`` means the neighbor is a *child* of ``current``.

        Mapping paths name neighbors loosely (``samples`` for node
        ``sample`` — the reference resolves via ORM backrefs).  We accept
        the exact label, or the label + trailing 's'/'es'.
        """
        candidates = {step}
        if step.endswith("ies"):
            candidates.add(step[:-3] + "y")
        if step.endswith("es"):
            candidates.add(step[:-2])
        if step.endswith("s"):
            candidates.add(step[:-1])
        # declared link names take priority: backref = parent's name for
        # its children, name = child's name for its parents
        for l in self._by_parent.get(current, []):  # neighbor is child
            if l.backref == step:
                return l.child, l, True
        for l in self._by_child.get(current, []):  # neighbor is parent
            if l.name == step:
                return l.parent, l, False
        for l in self._by_parent.get(current, []):
            if l.child in candidates:
                return l.child, l, True
        for l in self._by_child.get(current, []):
            if l.parent in candidates:
                return l.parent, l, False
        raise KeyError(f"cannot resolve path step {step!r} from node {current!r}")


def dictionary_from_json_schemas(schemas: dict[str, dict]) -> Dictionary:
    """Build a Dictionary from per-node JSON Schemas — the Gen3 data
    dictionary format as found in the reference's ``schema.json``
    fixtures: keys may be ``<label>.yaml``, properties may embed
    ``$ref`` includes and link stubs, and the physical edge table name
    follows the psqlgraph convention
    ``edge_<child><label><parent>`` with underscores stripped
    (observed: ``edge_participantrecruitedatcenter``)."""
    nodes, links = [], []
    sys_props = {"id", "type", "created_datetime", "updated_datetime", "state",
                 "submitter_id", "project_id"}
    clean = {
        (label[:-5] if label.endswith(".yaml") else label): schema
        for label, schema in schemas.items()
    }
    link_names: dict[str, set[str]] = {}
    for label, schema in clean.items():
        if label.startswith("_"):
            continue
        link_names[label] = {
            l.get("name") for l in _iter_links(schema.get("links") or [])
        }
    for label, schema in clean.items():
        if label.startswith("_"):
            continue
        props = {}
        properties = schema.get("properties") or {}
        for pname, pschema in properties.items():
            if pname in ("id", "type", "$ref") or not isinstance(pschema, dict):
                continue
            if pname in link_names.get(label, set()):
                continue  # link stubs masquerading as properties
            if "$ref" in pschema and pname not in sys_props:
                continue
            props[pname] = prop_type_from_schema(pschema)
        if "$ref" in properties:
            # a properties-level $ref pulls in the Gen3 "ubiquitous"
            # definitions (submitter_id, project_id, timestamps, state);
            # materialize them as strings when not declared inline
            for pname in ("submitter_id", "project_id", "state",
                          "created_datetime", "updated_datetime"):
                props.setdefault(pname, PropType("string"))
        nodes.append(NodeDef(label=label, props=props, category=schema.get("category")))
        for link in _iter_links(schema.get("links") or []):
            parent = link.get("target_type")
            if parent:
                edge = f"{label}{link.get('label', 'memberof')}{parent}".replace("_", "")
                links.append(
                    Link(
                        child=label,
                        parent=parent,
                        edge=edge,
                        multiplicity=link.get("multiplicity", "many_to_one"),
                        name=link.get("name"),
                        backref=link.get("backref"),
                    )
                )
    return Dictionary(nodes, links)


def _iter_links(links: list) -> list[dict]:
    out = []
    for l in links:
        if "subgroup" in l:
            out.extend(_iter_links(l["subgroup"]))
        else:
            out.append(l)
    return out
