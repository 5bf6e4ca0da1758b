"""One-shot mechanical splitter for spapy_ray/oracle.py into domain
modules under spapy_ray/oracles/, mirroring the queries split: a
q_NAME oracle goes to the domain its engine twin lives in
(pipelines/q_*.py); helpers/constants go to oracles/common.py; the
oracle.py facade re-exports everything so `from spapy_ray import
oracle as o; o.q_x()` keeps working. Cross-function calls get local
imports (cycle-free)."""

from __future__ import annotations

import re
import sys
from collections import OrderedDict

SRC = "spapy_ray/oracle.py"


def main() -> None:
    sys.path.insert(0, ".")
    # engine-side domain of each q_NAME
    from spapy_ray.pipelines import (q_embed, q_graph, q_media,
                                     q_raster, q_relational,
                                     q_spatial, q_text)
    domain_of: dict[str, str] = {}
    for d, mod in [("media", q_media), ("graph", q_graph),
                   ("raster", q_raster), ("text", q_text),
                   ("embed", q_embed), ("spatial", q_spatial),
                   ("relational", q_relational)]:
        for n in dir(mod):
            if n.startswith("q_") and callable(getattr(mod, n)) and \
                    getattr(mod, n).__module__ == mod.__name__:
                domain_of[n] = d

    src = open(SRC).read()
    lines = src.split("\n")
    start_re = re.compile(r"^(def |@|[A-Za-z_][A-Za-z0-9_]* =)")
    starts = [i for i, l in enumerate(lines) if start_re.match(l)]
    header = "\n".join(lines[:starts[0]]).rstrip()

    bodies = []
    for bi, s in enumerate(starts):
        e = starts[bi + 1] if bi + 1 < len(starts) else len(lines)
        bodies.append("\n".join(lines[s:e]).rstrip())

    qfuncs: "OrderedDict[str, str]" = OrderedDict()
    common_parts: list[str] = []
    for body in bodies:
        m = re.match(r"def (q_\w+)\(", body)
        if m:
            qfuncs[m.group(1)] = body
        else:
            common_parts.append(body)

    assign = {n: domain_of.get(n, "relational") for n in qfuncs}
    doms = ["media", "graph", "raster", "text", "embed", "spatial",
            "relational"]
    out: dict[str, list[str]] = {d: [] for d in doms}
    for name, body in qfuncs.items():
        dom = assign[name]
        calls = set(re.findall(r"\b(q_\w+)\(", body)) - {name}
        need = sorted(c for c in calls
                      if c in assign and assign[c] != dom)
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
            imports = [f"    from spapy_ray.oracles.{assign[c]} "
                       f"import {c}" for c in need]
            body = "\n".join(blines[:ins] + imports + blines[ins:])
        out[dom].append(body)

    star = ("__all__ = [n for n in globals()\n"
            "           if not n.startswith('__')]\n")
    import os
    os.makedirs("spapy_ray/oracles", exist_ok=True)
    with open("spapy_ray/oracles/__init__.py", "w") as f:
        f.write('"""DuckDB oracle SQL builders, split by engine '
                'domain (see oracle.py)."""\n')
    with open("spapy_ray/oracles/common.py", "w") as f:
        f.write(header + "\n\n\n")
        f.write("\n\n\n".join(common_parts))
        f.write("\n\n\n" + star)
    for d in doms:
        with open(f"spapy_ray/oracles/{d}.py", "w") as f:
            f.write(f'"""{d.capitalize()} oracle twins (split from '
                    'oracle.py)."""\n\n'
                    "from spapy_ray.oracles.common import *  "
                    "# noqa: F401,F403\n\n\n")
            f.write("\n\n\n".join(out[d]))
            f.write("\n")
    with open("spapy_ray/oracle_new.py", "w") as f:
        f.write('"""DuckDB oracle SQL builders — facade.\n\n'
                "Twin bodies live in spapy_ray/oracles/<domain>.py "
                "(same domains\nas pipelines/q_*.py); this module "
                're-exports every builder."""\n\n'
                "from spapy_ray.oracles.common import *  "
                "# noqa: F401,F403\n")
        for d in doms:
            f.write(f"from spapy_ray.oracles.{d} import *  "
                    "# noqa: F401,F403\n")
    print({d: len(out[d]) for d in doms})
    print("funcs:", len(qfuncs), "common:", len(common_parts))


if __name__ == "__main__":
    main()
