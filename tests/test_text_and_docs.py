

def test_pii_scrub_planted(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from spapy_ray.stages.text import pii_scrub
    from spapy_ray import oracle as o

    docs = pd.DataFrame({"doc_id": list(range(6)), "text": [
        "contact me at jane.doe+spam@example.co.uk for details",
        "server at 192.168.0.1 and 8.8.8.8 responded",
        "call +1-555-123-4567 or 020 7946 0958 now",
        "no pii here at all just words",
        "mixed: bob@x.io from 10.0.0.255 dials +44 20 7946 0958",
        "",
    ]})
    got = pii_scrub(rd.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(o.q_docs_pii_scrub()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["text"]) == list(want["text"])  # byte-identical
    joined = " ".join(got["text"])
    assert "[EMAIL]" in joined and "[IP]" in joined and "[PHONE]" in joined
    assert "@" not in joined and "192.168" not in joined
