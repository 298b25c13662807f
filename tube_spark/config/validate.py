"""Mapping validation: catch broken mappings at compile time with
actionable messages, before any Spark job runs.

The reference fails at runtime deep inside translate steps (KeyErrors
from the ORM, AnalysisExceptions from Spark); here a mapping + dictionary
pair is checked structurally first: unknown root/category, unresolvable
path steps, unknown props, missing sorted_by on fan-out flattens,
unknown aggregation fns, filter props absent from the document.
"""

from __future__ import annotations

from tube_spark.config.mapping import FilterNode, Mapping, NestedProp
from tube_spark.dictionary import Dictionary


def validate_mapping(mapping: Mapping, dictionary: Dictionary) -> list[str]:
    """Returns a list of problems (empty = valid)."""
    problems: list[str] = []

    def check_path(start: str, steps: tuple[str, ...], where: str) -> str | None:
        current = start
        for step in steps:
            try:
                current, _, _ = dictionary.resolve_step(current, step)
            except KeyError:
                problems.append(
                    f"{where}: cannot resolve path step {step!r} from node "
                    f"{current!r} (path {'.'.join(steps)})"
                )
                return None
        return current

    def check_props(label: str | None, props, where: str) -> None:
        if label is None or label not in dictionary.nodes:
            return
        known = dictionary.nodes[label].props
        if not known:  # relational sources don't enumerate props
            return
        for p in props:
            if p.source not in known and p.source != "id":
                problems.append(
                    f"{where}: node {label!r} has no property {p.source!r}"
                )

    if mapping.type == "aggregator":
        root = mapping.root
        if root not in dictionary.nodes:
            problems.append(f"root node {root!r} not in dictionary")
            return problems
        check_props(root, mapping.props, "props")

        for pp in mapping.parent_props:
            current = root
            for step in pp.steps:
                try:
                    nxt, _, is_child = dictionary.resolve_step(current, step.label)
                except KeyError:
                    problems.append(
                        f"parent_props: cannot resolve {step.label!r} from {current!r}"
                    )
                    break
                if is_child:
                    problems.append(
                        f"parent_props: step {step.label!r} goes to a CHILD of "
                        f"{current!r}; parent paths must climb ancestors"
                    )
                    break
                check_props(nxt, step.props, f"parent_props[{step.label}]")
                current = nxt

        for fp in mapping.flatten_props:
            target = check_path(root, fp.path, "flatten_props")
            if target:
                check_props(target, fp.props, f"flatten_props[{'.'.join(fp.path)}]")
                from tube_spark.operators.paths import resolve_path

                class _D:  # minimal source shim for resolve_path
                    pass

                shim = _D()
                shim.dictionary = dictionary
                walk = resolve_path(shim, root, fp.path)
                if not walk.unique_per_root and fp.sort_col is None:
                    problems.append(
                        f"flatten_props[{'.'.join(fp.path)}]: one-to-many "
                        "relation needs sorted_by to pick the top-1 child"
                    )

        for ap in mapping.aggregated_props:
            target = check_path(root, ap.path, f"aggregated_props[{ap.name}]")
            if target and ap.src:
                check_props(
                    target,
                    [type("P", (), {"source": ap.src})],
                    f"aggregated_props[{ap.name}]",
                )

        def check_filter(node: FilterNode | None, available: set[str], where: str) -> None:
            if node is None:
                return
            if node.is_compound:
                for c in node.children:
                    check_filter(c, available, where)
            elif node.prop not in available:
                problems.append(
                    f"{where}: filter references {node.prop!r}, which is not a "
                    "declared property at this level"
                )

        def walk_nested(parent: str, np: NestedProp) -> None:
            target = check_path(parent, np.path, f"nested_props[{np.name}]")
            if target:
                check_props(target, np.props, f"nested_props[{np.name}]")
                check_filter(
                    np.filter, {p.name for p in np.props}, f"nested_props[{np.name}]"
                )
                for c in np.children:
                    walk_nested(target, c)

        for np in mapping.nested_props:
            walk_nested(root, np)

        # mapping-level filters may reference computed columns (flatten
        # outputs, aggregates) as well as root props
        doc_cols = {p.name for p in mapping.props}
        doc_cols |= {p.name for fp in mapping.flatten_props for p in fp.props}
        doc_cols |= {a.name for a in mapping.aggregated_props}
        doc_cols |= {
            p.name for pp in mapping.parent_props for s in pp.steps for p in s.props
        }
        check_filter(mapping.filter, doc_cols, "filter")

    elif mapping.type == "collector":
        leaves = dictionary.nodes_in_category(mapping.category)
        if not leaves:
            problems.append(f"no nodes with category {mapping.category!r}")
        for inj in mapping.injecting_props:
            if inj.node not in dictionary.nodes:
                problems.append(f"injecting_props: unknown node {inj.node!r}")
    else:
        problems.append(f"unknown mapping type {mapping.type!r}")

    return problems
