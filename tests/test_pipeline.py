"""End-to-end pipeline tests (one shared Ray session, conftest)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from spapy_ray.kernels import geom, wkb
from spapy_ray.pipelines.flagship import flagship_join, pages_dataset
from spapy_ray.sources.pages import gen_pages_table
from spapy_ray.sources.zones import zones_table
from spapy_ray.stages.cellindex import cell_index
from spapy_ray.stages.geocode import geocode
from spapy_ray.stages.join import ZoneIndex

N = 2000


@pytest.fixture(scope="module")
def join_df(ray_session):
    return flagship_join(n=N).to_pandas()


def test_flagship_produces_join_rows(join_df):
    assert len(join_df) > 0
    assert {"url", "warc_ts", "text", "lang", "cell", "tile",
            "zone_id", "name", "labelrank", "area_class"} <= set(join_df.columns)


def test_join_matches_bruteforce_reference_algorithm(join_df, ray_session):
    """Row-for-row parity with the reference's O(N*M) nested-loop join
    (SpaVectors.py:964-983 OverlayWithDataset semantics)."""
    pages = geocode(pages_dataset(n=N, include_html=False)).to_pandas()
    zones = zones_table()
    mps = [wkb.as_multipolygon(g) for g in zones.column("geom_wkb").to_pylist()]
    lon, lat = pages["lon"].to_numpy(), pages["lat"].to_numpy()
    expected = set()
    for zi, mp in enumerate(mps):
        inside = geom.pip_multipolygon(lon, lat, mp)
        for pi in np.nonzero(inside)[0]:
            expected.add((pages["url"].iloc[pi], pages["warc_ts"].iloc[pi],
                          int(zones.column("zone_id")[zi].as_py())))
    got = set(zip(join_df["url"], join_df["warc_ts"], join_df["zone_id"]))
    assert got == expected


def test_text_passthrough_invariant(join_df, ray_session):
    """BASELINE.json input_hint: byte-identical extracted text per url
    through the whole pipeline."""
    src = gen_pages_table(np.arange(N), N, include_html=False).to_pandas()
    src_text = src.drop_duplicates("url").set_index("url")["text"]
    out = join_df.drop_duplicates("url")
    for url, text in zip(out["url"], out["text"]):
        assert text == src_text[url], f"text mutated for {url}"
    # and every joined row's text matches its url's source text
    assert (join_df["text"].to_numpy() ==
            src_text.reindex(join_df["url"]).to_numpy()).all()


def test_geocode_sources(ray_session):
    df = geocode(pages_dataset(n=1000, include_html=False)).to_pandas()
    assert set(df["geo_src"]) == {"text", "url"}
    frac_text = (df["geo_src"] == "text").mean()
    assert 0.2 < frac_text < 0.4  # ~30% carry text coordinates
    assert df["lat"].between(-90, 90).all()
    assert df["lon"].between(-180, 180).all()
    # text-path coords equal the embedded string values
    t = df[df["geo_src"] == "text"]
    ext = t["text"].str.extract(r" geo: (-?\d+\.\d+),(-?\d+\.\d+)")
    assert (t["lat"].to_numpy() == ext[0].astype(float).to_numpy()).all()
    assert (t["lon"].to_numpy() == ext[1].astype(float).to_numpy()).all()


def test_cell_index_consistency(ray_session):
    df = cell_index(geocode(pages_dataset(n=500, include_html=False))).to_pandas()
    from spapy_ray.kernels import cells

    cell = cells.encode(df["lon"].to_numpy(), df["lat"].to_numpy(), 12)
    tile = cells.encode(df["lon"].to_numpy(), df["lat"].to_numpy(), 7)
    assert (df["cell"].to_numpy().astype(np.uint64) == cell).all()
    assert (df["tile"].to_numpy().astype(np.uint64) == tile).all()
    # tile is the ancestor of cell
    assert (cells.parent(cell, 7) == tile).all()


def test_zone_index_unit(ray_session):
    """ZoneIndex query == brute force on a small grid of probes."""
    zi = ZoneIndex(zones_table(50))
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(-85, 85, 3000)
    pi, zz = zi.query(lon, lat)
    got = set(zip(pi.tolist(), zz.tolist()))
    expected = set()
    for z in range(50):
        inside = geom.pip_multipolygon(lon, lat, zi.multipolygons[z])
        expected |= {(int(i), z) for i in np.nonzero(inside)[0]}
    assert got == expected


def test_dup_urls_have_identical_text(ray_session):
    tbl = gen_pages_table(np.arange(N), N, include_html=True).to_pandas()
    per_url = tbl.groupby("url")["text"].nunique()
    assert (per_url == 1).all()
    assert tbl["url"].nunique() < len(tbl)  # dups exist
    # html embeds the text bytes
    row = tbl.iloc[0]
    assert row["text"].encode() in row["html"]


def test_flagship_golden_hash(ray_session):
    """Golden end-to-end gate (SURVEY §5): content hash of the sorted
    sf0.001 flagship join output is pinned. Any change to synthesis,
    geocoding, cell encoding, join semantics or zone geometry breaks
    this hash — bump it ONLY with a reviewed semantic change."""
    import hashlib

    df = flagship_join("/root/testdata/sf0.001").to_pandas()
    df = df.sort_values(["url", "warc_ts", "zone_id"]).reset_index(drop=True)
    df["warc_ts"] = df["warc_ts"].astype("int64")
    canon = df.to_csv(index=False, float_format="%.10g").encode()
    assert len(df) == 1377
    assert hashlib.sha256(canon).hexdigest() == \
        "4fa3f69e4c140669954868076305963bffc462d6d4338bd532355c1f7ae07907"
