"""Round-5 regression tests: ADVICE fixes (blocklist case folding,
butterfly census fat-basket consistency) and new round-5 guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_compressed_finalize_max_distinct_guard(ray_session):
    """A high-cardinality column breaks the distinct-value-compression
    contract: the driver-side finalize must raise loudly instead of
    silently materializing millions of rows; under the cap the result
    is unchanged."""
    from vaero_ray.stages.numstats import rank_sum_test, shape_per_group

    df = pd.DataFrame({"v": np.arange(1000, dtype=np.int64),
                       "g": ["a", "b"] * 500})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="max_distinct"):
        rank_sum_test(ds, "v", "g", "a", "b", max_distinct=100)
    with pytest.raises(ValueError, match="max_distinct"):
        shape_per_group(ds, "v", "g", max_distinct=100)
    t = rank_sum_test(ds, "v", "g", "a", "b").to_pandas()
    # exact check: ranks of evens (a) among 0..999
    assert int(t["n1"][0]) == 500 and int(t["n2"][0]) == 500
    two_r1 = int(2 * sum(range(1, 1001, 2)))  # a holds values 0,2,..,998 -> ranks 1,3,..,999
    assert int(t["two_r1"][0]) == two_r1


def _gw_source(**kw):
    import json

    from vaero_ray.cdk.source_google_workspace import TOKEN_URL, GoogleWorkspaceSource

    state = {"clock": 1_700_000_000.0, "exchanges": [], "signed": []}

    def token_transport(url, params, headers):
        assert url == TOKEN_URL
        assert params["grant_type"] == "urn:ietf:params:oauth:grant-type:jwt-bearer"
        state["exchanges"].append(dict(params))
        return 200, json.dumps(
            {"access_token": f"tok-{len(state['exchanges'])}", "expires_in": 3599}
        )

    def signer(claims, key):
        assert key == "PEMKEY"
        state["signed"].append(claims)
        return f"signed-assertion-{len(state['signed'])}"

    src = GoogleWorkspaceSource(
        secrets={
            "email": "admin@corp.test",
            "auth_file": {
                "client_email": "svc@p.iam",
                "private_key": "PEMKEY",
                "type": "service_account",
            },
        },
        token_transport=token_transport,
        signer=signer,
        now_fn=lambda: state["clock"],
        clock=lambda: state["clock"],
        sleep=lambda s: None,
        **kw,
    )
    return src, state


def test_google_workspace_oauth_token_exchange():
    """Assertion -> token -> Bearer path through the injectable transport
    (mirrors reference source_google_workspace.py:139-180): correct JWT
    claims, POSTed grant, token cached until expiry, fresh exchange after."""
    from vaero_ray.cdk.source_google_workspace import TOKEN_URL

    src, state = _gw_source()
    assert src.authorize() == "tok-1"
    c = state["signed"][0]
    assert c["iss"] == "svc@p.iam" and c["sub"] == "admin@corp.test"
    assert c["aud"] == TOKEN_URL and c["exp"] - c["iat"] == 3599
    assert state["exchanges"][0]["assertion"] == "signed-assertion-1"
    # cached: no second exchange within the expiry window
    assert src.authorize() == "tok-1" and len(state["exchanges"]) == 1
    assert src.headers()["Authorization"] == "Bearer tok-1"
    # past expiry: a fresh exchange with a fresh assertion
    state["clock"] += 4000
    assert src.authorize() == "tok-2" and len(state["exchanges"]) == 2


def test_google_workspace_401_refreshes_token():
    """A 401 on the read path invalidates the cached token and retries
    once with a freshly exchanged one."""
    import json

    served = []

    def read_transport(url, params, headers):
        served.append(headers["Authorization"])
        if headers["Authorization"] == "Bearer tok-1":
            return 401, "{}", {}
        return 200, json.dumps({"items": []}), {}

    src, state = _gw_source(apps=["admin"], transport=read_transport)
    assert src.poll() == []
    assert served == ["Bearer tok-1", "Bearer tok-2"]
    assert len(state["exchanges"]) == 2


def test_blocklist_uppercase_terms_match(ray_session):
    """Case-insensitive contract holds for terms containing uppercase:
    the text is lowercased per batch, so terms must be folded too."""
    from vaero_ray.stages.textstats import blocklist_scan

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["Spark and SPARK", "no match"],
    })
    ds = rd.from_pandas(docs)
    out = (
        blocklist_scan(ds, ["Spark", "MATCH"], min_hits=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["total_hits"]) == [2, 1]
    assert list(out["n_terms"]) == [1, 1]
    assert list(out["flagged"]) == [1, 0]


def test_butterflies_fat_basket_internally_consistent(ray_session):
    """With a basket over max_basket, BOTH passes (butterflies via pair
    emission, wedges/caterpillars via item partials) must use the same
    truncated edge set — the census must equal the brute-force census of
    the graph truncated to each basket's max_basket smallest items."""
    from vaero_ray.stages.basket import bipartite_butterflies

    rng = np.random.default_rng(5)
    rows = []
    for g in range(12):
        k = 20 if g < 2 else int(rng.integers(2, 6))  # two fat baskets
        items = rng.choice(30, size=k, replace=False)
        rows.extend({"g": g, "i": int(i)} for i in items)
    df = pd.DataFrame(rows)
    cap = 5
    ds = rd.from_pandas(df).repartition(3)
    t = bipartite_butterflies(ds, "g", "i", max_basket=cap).to_pandas()

    # brute force over the truncated edge set
    trunc = (
        df.drop_duplicates().sort_values(["g", "i"], kind="mergesort")
        .groupby("g", sort=False).head(cap)
    )
    groups, items = {}, {}
    for g, i in trunc.to_numpy():
        groups.setdefault(g, set()).add(i)
        items.setdefault(i, set()).add(g)
    n_edges = sum(len(v) for v in groups.values())
    wg = sum(len(v) * (len(v) - 1) // 2 for v in groups.values())
    wi = sum(len(v) * (len(v) - 1) // 2 for v in items.values())
    from itertools import combinations
    co = {}
    for g, its in groups.items():
        for a, b in combinations(sorted(its), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    bf = sum(c * (c - 1) // 2 for c in co.values())
    cat = sum(
        (len(groups[g]) - 1) * (len(items[i]) - 1) for g, its in groups.items() for i in its
    )
    assert int(t["n_edges"][0]) == n_edges
    assert int(t["wedges_group"][0]) == wg
    assert int(t["wedges_item"][0]) == wi
    assert int(t["n_butterflies"][0]) == bf
    assert int(t["n_caterpillars"][0]) == cat
    if cat:
        assert abs(float(t["bcc"][0]) - 4.0 * bf / cat) < 1e-6
