"""Schema regeneration tool — the engine's Generate.java.

Reference: `Generate.java:56-140` codegens `Tables.java` /
`OpenMapTilesSchema.java` from the OpenMapTiles repo's imposm3
`mapping.yaml` files at a pinned tag (fetched over the network; tested in
`GenerateTest.java:20-227`). This sandbox has no network, so the engine
pins an offline snapshot at `schema/openmaptiles_snapshot.yaml` — exported
once from the verified checked-in constants and from then on the SOURCE OF
TRUTH for regeneration: a schema-version bump means replacing/editing the
snapshot, running `--emit-py`, and reviewing the diff, exactly the
reference's workflow with a downloaded tag.

The yaml understands the imposm3 core form (``type`` + ``mapping`` +
``filters: {require, reject}`` + ``columns``) so an upstream mapping.yaml's
tables load directly, plus an ``expr`` escape hatch for the reference's
richer generated expressions (nested and/or/not) that the flat form cannot
express.

Usage:
    python tools/generate_schema.py --export <out.yaml>   # dump checked-in
    python tools/generate_schema.py --check  <in.yaml>    # compare (CI)
    python tools/generate_schema.py --emit-py <in.yaml>   # print _t() block
"""

from __future__ import annotations

import argparse
import sys

import yaml

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from planetiler_openmaptiles_spark.schema import layers as layers_mod
from planetiler_openmaptiles_spark.schema.tables import (
    AND, ANY, FIELD, NOT, OR, TYPE, And, MatchAny, MatchField, MatchType,
    Not, Or, TABLES, TableSpec,
)

_TYPE_CODES = {"string": "s", "bool": "b", "integer": "l", "int": "i",
               "direction": "d", "wayzorder": "z"}
_CODE_TYPES = {v: k for k, v in _TYPE_CODES.items()}


# ----------------------------------------------------------- expr <-> yaml


def expr_to_yaml(e):
    if isinstance(e, MatchAny):
        return {"any": {"key": e.key, "values": list(e.values)}}
    if isinstance(e, MatchField):
        return {"field": e.key}
    if isinstance(e, MatchType):
        return {"type": e.gtype}
    if isinstance(e, And):
        return {"and": [expr_to_yaml(p) for p in e.parts]}
    if isinstance(e, Or):
        return {"or": [expr_to_yaml(p) for p in e.parts]}
    if isinstance(e, Not):
        return {"not": expr_to_yaml(e.part)}
    raise TypeError(type(e))


def expr_from_yaml(d):
    if "any" in d:
        return ANY(d["any"]["key"], *d["any"]["values"])
    if "field" in d:
        return FIELD(d["field"])
    if "type" in d:
        return TYPE(d["type"])
    if "and" in d:
        return AND(*[expr_from_yaml(p) for p in d["and"]])
    if "or" in d:
        return OR(*[expr_from_yaml(p) for p in d["or"]])
    if "not" in d:
        return NOT(expr_from_yaml(d["not"]))
    raise ValueError(f"unknown expr node: {d}")


def _imposm_mapping_expr(t: dict):
    """Build the expression an imposm3-core table describes:
    AND(OR(any per mapping key...), require..., NOT(reject)..., TYPE)."""
    parts = []
    mapping = t.get("mapping") or {}
    if mapping:
        parts.append(OR(*[ANY(k, *vs) for k, vs in mapping.items()]))
    filters = t.get("filters") or {}
    for k, vs in (filters.get("require") or {}).items():
        parts.append(ANY(k, *vs))
    for k, vs in (filters.get("reject") or {}).items():
        parts.append(NOT(ANY(k, *vs)))
    if t.get("type"):
        parts.append(TYPE(t["type"]))
    return AND(*parts)


def table_to_yaml(spec: TableSpec) -> dict:
    out: dict = {}
    # prefer the imposm3 core form when it reproduces the expression exactly
    core = None
    if isinstance(spec.mapping, And) and spec.mapping.parts:
        parts = list(spec.mapping.parts)
        cand: dict = {}
        i = 0
        if isinstance(parts[0], Or) and all(isinstance(p, MatchAny) for p in parts[0].parts):
            cand["mapping"] = {p.key: list(p.values) for p in parts[0].parts}
            i = 1
        require, reject = {}, {}
        while i < len(parts) - 1:
            p = parts[i]
            if isinstance(p, MatchAny):
                require[p.key] = list(p.values)
            elif isinstance(p, Not) and isinstance(p.part, MatchAny):
                reject[p.part.key] = list(p.part.values)
            else:
                break
            i += 1
        if i == len(parts) - 1 and isinstance(parts[-1], MatchType):
            cand["type"] = parts[-1].gtype
            if require or reject:
                cand["filters"] = {}
                if require:
                    cand["filters"]["require"] = require
                if reject:
                    cand["filters"]["reject"] = reject
            if _imposm_mapping_expr(cand) == spec.mapping:
                core = cand
    if core is not None:
        out.update(core)
    else:
        out["expr"] = expr_to_yaml(spec.mapping)
    if spec.columns:
        out["columns"] = [
            {"name": name, "key": key, "type": _CODE_TYPES[code]}
            for name, (key, code) in spec.columns.items()
        ]
    if spec.mapping_keys:
        out["mapping_keys"] = list(spec.mapping_keys)
    return out


def table_from_yaml(name: str, t: dict) -> TableSpec:
    if "expr" in t:
        mapping = expr_from_yaml(t["expr"])
    else:
        mapping = _imposm_mapping_expr(t)
    columns = {
        c["name"]: (c["key"], _TYPE_CODES[c["type"]]) for c in t.get("columns") or []
    }
    return TableSpec(name, mapping, columns, tuple(t.get("mapping_keys") or ()))


# ------------------------------------------------------------- whole schema


def export_schema() -> dict:
    return {
        "version": 1,
        "layers": {
            name: {"buffer": layers_mod.LAYER_BUFFERS[name]} for name in layers_mod.LAYERS
        },
        "tables": {name: table_to_yaml(spec) for name, spec in TABLES.items()},
    }


def load_schema(path: str):
    with open(path) as f:
        doc = yaml.safe_load(f)
    tables = {n: table_from_yaml(n, t) for n, t in doc.get("tables", {}).items()}
    layers = {n: v["buffer"] for n, v in doc.get("layers", {}).items()}
    return tables, layers


def diff_schema(tables: dict, layers: dict) -> list[str]:
    problems = []
    if list(layers) != layers_mod.LAYERS:
        problems.append(f"layer list differs: {list(layers)} vs {layers_mod.LAYERS}")
    for n, b in layers.items():
        if layers_mod.LAYER_BUFFERS.get(n) != b:
            problems.append(f"layer {n}: buffer {b} vs {layers_mod.LAYER_BUFFERS.get(n)}")
    for n in set(tables) | set(TABLES):
        a, b = tables.get(n), TABLES.get(n)
        if a is None or b is None:
            problems.append(f"table {n}: only in {'yaml' if b is None else 'code'}")
        elif a != b:
            for fieldname in ("mapping", "columns", "mapping_keys"):
                if getattr(a, fieldname) != getattr(b, fieldname):
                    problems.append(f"table {n}: {fieldname} differs")
    return problems


def emit_py(tables: dict) -> str:
    """Regenerate the _t(...) registration block of schema/tables.py."""

    def expr_py(e, ind):
        pad = "    " * ind
        if isinstance(e, MatchAny):
            vals = ", ".join(repr(v) for v in e.values)
            return f'{pad}ANY({e.key!r}, {vals})'
        if isinstance(e, MatchField):
            return f"{pad}FIELD({e.key!r})"
        if isinstance(e, MatchType):
            return f"{pad}TYPE({e.gtype!r})"
        if isinstance(e, Not):
            return f"{pad}NOT(\n{expr_py(e.part, ind + 1)}\n{pad})"
        tag = "AND" if isinstance(e, And) else "OR"
        inner = ",\n".join(expr_py(p, ind + 1) for p in e.parts)
        return f"{pad}{tag}(\n{inner}\n{pad})"

    chunks = []
    for name, spec in tables.items():
        cols = "\n".join(
            f"        {n!r}: ({k!r}, {c!r})," for n, (k, c) in spec.columns.items()
        )
        cols_block = f"    columns={{\n{cols}\n    }},\n" if spec.columns else ""
        mk = f"    mapping_keys={spec.mapping_keys!r},\n" if spec.mapping_keys else ""
        chunks.append(
            f"_t(\n    {name!r},\n{expr_py(spec.mapping, 1)},\n{cols_block}{mk})\n"
        )
    return "\n".join(chunks)


def main(argv=None):
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--export")
    g.add_argument("--check")
    g.add_argument("--emit-py")
    args = ap.parse_args(argv)
    if args.export:
        with open(args.export, "w") as f:
            yaml.safe_dump(export_schema(), f, sort_keys=False, allow_unicode=True)
        print(f"exported {len(TABLES)} tables, {len(layers_mod.LAYERS)} layers")
        return 0
    if args.check:
        problems = diff_schema(*load_schema(args.check))
        for p in problems:
            print(p)
        print("OK" if not problems else f"{len(problems)} differences")
        return 1 if problems else 0
    tables, _ = load_schema(args.emit_py)
    print(emit_py(tables))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
