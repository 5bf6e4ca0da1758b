"""One-shot mechanical splitter for pipelines/queries.py (round-5
verdict item: the 10.6k-line monolith) into domain modules.

Produces:
  pipelines/qcommon.py   — imports, constants, shared helpers
  pipelines/q_<dom>.py   — query functions grouped by domain
  pipelines/queries_new.py — explicit ordered QUERIES registry (the
                           rotation-order contract, unchanged)

Cross-module q-function calls get a local import injected at the top
of the calling function body (local, so domain modules can never
form an import cycle). A q-name defined twice keeps only the LAST
def (the monolith's shadowing semantics).
"""

from __future__ import annotations

import re
from collections import OrderedDict

SRC = "spapy_ray/pipelines/queries.py"

DOMAINS = [
    ("media", r"multimodal|sources\.media"),
    ("graph", r"stages\.graph|stages\.components|hash_to_min"),
    ("raster", r"stages\.raster|rasterprefix|stages\.rasterize|"
               r"stages\.contour|polygonize|stages\.render|geotiff|"
               r"aaigrid|sources\.hfa|synth_dem|RasterMeta|"
               r"_dem\(|_reclassified_dem|_tile_int_stats|"
               r"warp_dst_meta"),
    ("text", r"stages\.text|neardup|stages\.packing|"
             r"dedup_documents_by_text|documents"),
    ("embed", r"stages\.ann|stages\.ml|embeddings|stages\.quantiles"),
    ("spatial", r"stages\.join|stages\.knn|geocode|cellindex|"
                r"vector_ops|stages\.overlay|stages\.relate|"
                r"stages\.transform|measures|spatialstats|voronoi|"
                r"distjoin|zones_table|shapefile|stages\.cluster|"
                r"_geo\(|_join\(|stages\.partition|kernels\.cells|"
                r"dedup_pages|pages_dataset"),
]


def main() -> None:
    src = open(SRC).read()
    lines = src.split("\n")
    start_re = re.compile(
        r"^(def |QUERIES\[|QUERIES = \{|QUERIES\.update|@|"
        r"[A-Za-z_][A-Za-z0-9_]* =)")
    starts = [i for i, l in enumerate(lines) if start_re.match(l)]
    header = "\n".join(lines[:starts[0]]).rstrip()

    bodies = []
    for bi, s in enumerate(starts):
        e = starts[bi + 1] if bi + 1 < len(starts) else len(lines)
        bodies.append("\n".join(lines[s:e]).rstrip())

    # registration order straight from anchored scans of the source,
    # in FILE order across all three forms (literal, .update blocks,
    # item assignment)
    events = []
    m = re.search(r"^QUERIES = \{\n(.*?)^\}", src, re.M | re.S)
    for i, (name, fn) in enumerate(
            re.findall(r'"([^"]+)":\s*(q_\w+),', m.group(1))):
        events.append((m.start(), i, name, fn))
    for m in re.finditer(r"^QUERIES\.update\(\{\n(.*?)^\}\)", src,
                         re.M | re.S):
        for i, (name, fn) in enumerate(
                re.findall(r'"([^"]+)":\s*(q_\w+),', m.group(1))):
            events.append((m.start(), i, name, fn))
    for m in re.finditer(r'^QUERIES\["([^"]+)"\] = (\w+)', src, re.M):
        events.append((m.start(), 0, m.group(1), m.group(2)))
    order: "OrderedDict[str, str]" = OrderedDict()
    for _, _, name, fn in sorted(events):
        order[name] = fn

    qfuncs: "OrderedDict[str, str]" = OrderedDict()
    common_parts: list[str] = []
    shadowed = []
    for body in bodies:
        if body.startswith("QUERIES"):
            continue
        m = re.match(r"def (q_\w+)\(", body)
        if m:
            if m.group(1) in qfuncs:
                shadowed.append(m.group(1))
            qfuncs[m.group(1)] = body  # keep LAST def
        else:
            common_parts.append(body)

    assign: dict[str, str] = {}
    for name, body in qfuncs.items():
        dom = "relational"
        for d, pat in DOMAINS:
            if re.search(pat, body):
                dom = d
                break
        assign[name] = dom

    defined_in = dict(assign)
    doms = [d for d, _ in DOMAINS] + ["relational"]
    out_funcs: dict[str, list[str]] = {d: [] for d in doms}
    for name, body in qfuncs.items():
        dom = assign[name]
        calls = set(re.findall(r"\b(q_\w+)\(", body)) - {name}
        need = sorted(c for c in calls
                      if defined_in.get(c) and defined_in[c] != dom)
        if need:
            blines = body.split("\n")
            ins = 1
            stripped = blines[ins].strip()
            if stripped.startswith(('"""', "'''")):
                quote = stripped[:3]
                if not (len(stripped) > 3 and stripped.endswith(quote)):
                    ins += 1
                    while quote not in blines[ins]:
                        ins += 1
                ins += 1
            imports = [
                f"    from spapy_ray.pipelines.q_{defined_in[c]} "
                f"import {c}" for c in need]
            body = "\n".join(blines[:ins] + imports + blines[ins:])
        out_funcs[dom].append(body)

    star = ("__all__ = [n for n in globals()\n"
            "           if not n.startswith('__')]\n")
    with open("spapy_ray/pipelines/qcommon.py", "w") as f:
        f.write(header + "\n\n\n")
        f.write("\n\n\n".join(common_parts))
        f.write("\n\n\n" + star)

    for d in doms:
        with open(f"spapy_ray/pipelines/q_{d}.py", "w") as f:
            f.write(f'"""{d.capitalize()} query pipelines (split '
                    'from queries.py; registry order lives in\n'
                    'pipelines/queries.py)."""\n\n'
                    "from spapy_ray.pipelines.qcommon import *  "
                    "# noqa: F401,F403\n\n\n")
            f.write("\n\n\n".join(out_funcs[d]))
            f.write("\n")

    with open("spapy_ray/pipelines/queries_new.py", "w") as f:
        f.write('"""Ordered query registry.\n\n'
                "Function bodies live in the domain modules "
                "(pipelines/q_*.py);\nthis module preserves the "
                "REGISTRATION ORDER the driver-hash\nrotation "
                "depends on — append new queries at the end, never\n"
                'reorder."""\n\n')
        f.write("from spapy_ray.pipelines.qcommon import *"
                "  # noqa: F401,F403\n")
        for d in doms:
            f.write(f"from spapy_ray.pipelines import q_{d}\n")
        for d in doms:
            f.write(f"from spapy_ray.pipelines.q_{d} import *"
                    "  # noqa: F401,F403\n")
        f.write("\nQUERIES = {\n")
        for name, fn in order.items():
            f.write(f'    "{name}": q_{defined_in[fn]}.{fn},\n')
        f.write("}\n")
    print({d: len(out_funcs[d]) for d in doms})
    print("registered:", len(order), "funcs:", len(qfuncs))
    print("shadowed (kept last):", shadowed)
    missing = [f for f in order.values() if f not in qfuncs]
    print("registered-but-missing:", missing)


if __name__ == "__main__":
    main()
