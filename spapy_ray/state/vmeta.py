"""Dataset-level vector metadata (SURVEY.md §2.4 tail).

The reference keeps (CRS, geometry Type, AttributeDefs, Driver) as
mutable fields on the in-RAM dataset object and copies them with
CopyMetadata (SpaVectors.py:224-238). A distributed Dataset has no
single mutable header, so the engine carries the same facts as a
small companion :class:`VectorMeta` value that travels WITH the
pipeline (pass it alongside the Dataset), and persists them in the
Parquet file footer (Arrow schema metadata) so a write → read
round-trip restores them without a side channel.

Row-level Get/SetAttributeValue (SpaVectors.py:564-587) address rows
POSITIONALLY in the reference's Python lists; block order in a
distributed table is not a stable address, so the engine's
equivalents are KEY-addressed (get_attribute_value /
set_attribute_value in this module) — same observable semantics when
rows carry a unique key, which every engine table does.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

_META_KEY = b"spapy_ray.vector_meta"


@dataclass
class VectorMeta:
    crs: str = "epsg:4326"                    # SpaVectors.py:134
    geom_type: str = "Polygon"                # dataset-level Type (§1.1)
    driver: str = "Parquet"
    attribute_defs: dict = field(default_factory=dict)   # name → "type:width"

    def copy_from(self, other: "VectorMeta") -> None:
        """CopyMetadata semantics (SpaVectors.py:224-238)."""
        self.crs = other.crs
        self.geom_type = other.geom_type
        self.driver = other.driver
        self.attribute_defs = dict(other.attribute_defs)

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "VectorMeta":
        return cls(**json.loads(s))


def attach_meta(table: pa.Table, vmeta: VectorMeta) -> pa.Table:
    """Stamp the companion metadata into an Arrow schema (survives a
    Parquet write as file-footer metadata)."""
    md = dict(table.schema.metadata or {})
    md[_META_KEY] = vmeta.to_json().encode()
    return table.replace_schema_metadata(md)


def extract_meta(schema: pa.Schema) -> VectorMeta | None:
    md = schema.metadata or {}
    raw = md.get(_META_KEY)
    return VectorMeta.from_json(raw.decode()) if raw else None


def write_vector_parquet(ds, path: str, vmeta: VectorMeta) -> None:
    """Partition-parallel Parquet write with the metadata stamped into
    every file's footer."""
    ds.map_batches(lambda t: attach_meta(t, vmeta),
                   batch_format="pyarrow").write_parquet(path)


def read_vector_parquet(path: str):
    """→ (Dataset, VectorMeta | None): footer metadata read driver-side
    from one file (cheap), data streamed as usual."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    vmeta = None
    if files:
        vmeta = extract_meta(pq.read_schema(files[0]))
    return rd.read_parquet(path), vmeta


# ------------------------------------------------ row-level values

def get_attribute_value(ds, key_col: str, key, column: str):
    """Key-addressed GetAttributeValue (SpaVectors.py:564-574): the
    value of ``column`` for the row whose ``key_col`` equals ``key``.
    A point lookup — filters distributedly, returns one scalar."""
    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column(key_col), key)).select([column])

    rows = ds.map_batches(pick, batch_format="pyarrow").take(1)
    if not rows:
        raise KeyError(f"{key_col}={key!r} not found")
    return rows[0][column]


def set_attribute_value(ds, key_col: str, key, column: str, new_value):
    """Key-addressed SetAttributeValue (SpaVectors.py:576-587): a new
    Dataset with ``column`` replaced by ``new_value`` on the matching
    row(s). Lazy, vectorized, no driver materialization."""
    def repl(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column(key_col), key)
        col = t.column(column)
        new = pc.if_else(m, pa.scalar(new_value, type=col.type), col)
        return t.set_column(t.schema.get_field_index(column), column, new)

    return ds.map_batches(repl, batch_format="pyarrow")
