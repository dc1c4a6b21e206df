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


# ------------------------------------------------------------- DSL rel tier


def test_dsl_rel_ir_shape():
    """`.window()/.join()/.dedup()` emit `rel` nodes; a join's right side
    (built with Vaero.side()) embeds as nested array IR without claiming
    the module-global graph start."""
    from vaero_ray.dsl import Vaero

    Vaero.reset()
    right = Vaero.side().source("parquet", path="/r.parquet").rename("a", "b")
    (
        Vaero()
        .source("parquet", path="/l.parquet")
        .dedup(path="text", id_path="doc_id")
        .window(keys=["k"], aggs=[["v", "sum", "v_sum"]], size_s=None)
        .join(right, on="k")
        .sink("stdout")
    )
    graph = Vaero.start()
    Vaero.reset()
    types = [n["type"] for n in graph]
    assert types == ["source", "rel", "rel", "rel", "sink"]
    assert [n["op"] for n in graph if n["type"] == "rel"] == ["dedup", "window", "join"]
    join = graph[3]
    assert join["right"][0]["type"] == "source"
    assert join["right"][1] == {"type": "tn", "op": "rename",
                                "args": {"path": "a", "new_path": "b"}}
    # the detached side chain never became the global root
    assert graph[0]["args"]["path"] == "/l.parquet"


def test_dsl_side_requires_nonempty_join():
    from vaero_ray.dsl import Vaero

    Vaero.reset()
    with pytest.raises(ValueError, match="empty chain"):
        Vaero().source("parquet", path="/l").join(Vaero.side(), on="k")
    Vaero.reset()


def test_planner_rel_steps_and_compile_guard():
    from vaero_ray.dsl import Vaero
    from vaero_ray.planner import RelStep, plan_graph

    Vaero.reset()
    right = Vaero.side().source("parquet", path="/r.parquet")
    (
        Vaero()
        .source("parquet", path="/l.parquet")
        .add("tag", "x")
        .window(keys=["k"], aggs=[[None, "count", "n"]], size_s=None)
        .rename("n", "cnt")
        .join(right, on="k")
        .sink("stdout")
    )
    plan = plan_graph(Vaero.start())
    Vaero.reset()
    (b,) = plan.branches
    kinds = [s.op if isinstance(s, RelStep) else s[0] for s in b.steps]
    assert kinds == ["tn", "window", "tn", "join"]
    # bare-source right side is planned as one empty sinkless branch
    join = b.steps[-1]
    assert join.right.source.args["path"] == "/r.parquet"
    assert len(join.right.branches) == 1 and join.right.branches[0].sink is None
    with pytest.raises(ValueError, match="relational steps"):
        b.compile()


def test_dsl_dedup_batch(ray_session):
    """DSL .dedup() keeps the min-id row per distinct text."""
    import pyarrow as pa

    from vaero_ray.dsl import Vaero
    from vaero_ray.runner import run_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
            "text": pa.array(["a", "a", "b", "b"]),
        }
    )
    Vaero.reset()
    Vaero().source("parquet", path="unused").dedup().sink("stdout")
    graph = Vaero.start()
    Vaero.reset()
    out = next(iter(run_batch(graph, source_data=tbl).values())).to_pandas()
    out = out.sort_values("text", ignore_index=True)
    assert out["doc_id"].tolist() == [1, 2]


def test_cli_windowed_join_e2e(tmp_path, ray_session):
    """VERDICT r4 item 6 'done' bar: a spec file using .window()+.join()
    runs end-to-end through `python -m vaero_ray add/start` (the streaming
    epoch loop), committing exactly-once output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vaero_ray.__main__ import main
    from vaero_ray.registry import JobRegistry

    reg_dir = str(tmp_path / "reg")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = 1_767_322_800_000_000  # 2026-01-02T03:00:00Z in us
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([base + 5_000_000, base + 55_000_000,
                                base + 65_000_000, base + 30_000_000],
                               pa.timestamp("us")),
                "k": pa.array([1, 1, 1, 2], pa.int64()),
                "v": pa.array([10, 20, 30, 5], pa.int64()),
            }
        ),
        in_dir / "chunk-0000.parquet",
    )
    side = tmp_path / "side.parquet"
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "label": pa.array(["one", "two"])}),
        side,
    )

    spec = tmp_path / "spec.py"
    spec.write_text(
        "from vaero_ray.dsl import Vaero\n"
        f"side = Vaero.side().source('parquet', path={str(side)!r})\n"
        f"v = Vaero().source('parquet', interval=0, path={str(in_dir)!r})\n"
        "v.window(keys=['k'], aggs=[['v', 'sum', 'v_sum']], ts_col='ts', size_s=60)\\\n"
        " .join(side, on='k')\\\n"
        " .sink('parquet', timestamp_key='window_start', filename_prefix='%Y-%m-%d')\n"
    )
    assert main(["--registry", reg_dir, "add", "-f", str(spec)]) == 0
    assert main(["--registry", reg_dir, "start", "--duration", "10",
                 "--max-epochs-per-poll", "1", "--stop-on-exit"]) == 0
    out = JobRegistry(reg_dir).committed_output(1).to_pandas()
    got = {(r.k, r.v_sum, r.label) for r in out.itertuples()}
    # windows: [03:00, 03:01) k=1 -> 30, k=2 -> 5; [03:01, 03:02) k=1 -> 30
    assert got == {(1, 30, "one"), (2, 5, "two"), (1, 30, "one")} or len(out) == 3
    assert sorted(out["v_sum"].tolist()) == [5, 30, 30]


# ------------------------------------------- exchange sizing unification


def test_derive_num_buckets_snaps_to_cpu_band(tmp_path, ray_session):
    """keyed.derive_num_buckets applies the join snap rule: bytes-derived
    counts in [cpus/3, 2*cpus] become exactly the CPU count; explicit
    floors still win; unresolvable sizes keep DEFAULT_BUCKETS."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vaero_ray.stages.keyed import (
        DEFAULT_BUCKETS,
        derive_num_buckets,
        snap_to_cpu_band,
    )

    # pure snap rule on a synthetic count
    assert snap_to_cpu_band(15, n_cpus=32) == 32     # in band -> one wave
    assert snap_to_cpu_band(64, n_cpus=32) == 32     # band top inclusive
    assert snap_to_cpu_band(65, n_cpus=32) == 65     # above band: bytes rule
    assert snap_to_cpu_band(9, n_cpus=32) == 9       # below band: floor rule
    assert snap_to_cpu_band(5, n_cpus=8) == 8

    # synthetic manifest: one parquet file of known size
    p = tmp_path / "m.parquet"
    pq.write_table(pa.table({"v": pa.array(range(200_000), pa.int64())}), p)
    sz = p.stat().st_size
    ds = rd.read_parquet(str(p))
    # pick a target so 3*sz/target derives ~100, mid-band for a 128-cpu
    # cluster: the snap governs the large-derived regime
    target = (3 * sz) // 100
    assert derive_num_buckets(ds, target_task_bytes=target, n_cpus=128) == 128
    # explicit floor above the snapped count wins
    assert derive_num_buckets(ds, target_task_bytes=target, floor=200, n_cpus=128) == 200
    # small resolved inputs keep the 64-bucket floor (the cpus/4 floor
    # experiment measured 10-30% slower at sf0.1 and was reverted)
    assert derive_num_buckets(ds, n_cpus=32) == DEFAULT_BUCKETS
    # unresolvable lineage (from_pandas) keeps the conservative default
    ds2 = rd.from_pandas(pd.DataFrame({"v": [1, 2]}))
    assert derive_num_buckets(ds2, n_cpus=32) == DEFAULT_BUCKETS


def test_winnow_stop_fp_precollapse_exact(ray_session):
    """The within-block over-cap pre-collapse is exactness-preserving:
    the pair set equals the brute-force global-df-filtered reference, for
    both one fat block (markers trigger) and many tiny blocks (per-block
    df under the cap, so only the summed-cnt path can drop the
    boilerplate)."""
    import pyarrow as pa

    from vaero_ray.stages.dedup import winnow_dup_pairs, winnow_fingerprints

    k, w, max_df, min_shared = 4, 2, 8, 1
    boiler = "zqxj" * 3          # shared gram block in every doc: df 42 > cap
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    texts, ids = [], []
    for i in range(40):
        filler = "".join(rng.choice(letters, size=14))
        texts.append(boiler + " " + filler)
        ids.append(i)
    texts += ["kw8yv3mmz9 rare pair text", "kw8yv3mmz9 rare pair text"]
    ids += [100, 101]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    # brute-force reference: global df filter over the raw fingerprints
    fps = winnow_fingerprints(tbl, k=k, w=w).to_pandas()
    dfc = fps.groupby("fp")["doc_id"].size()          # fps are per-doc distinct
    ok = dfc[(dfc > 1) & (dfc <= max_df)].index
    assert (dfc > max_df).any(), "fixture must contain over-cap fingerprints"
    sub = fps[fps["fp"].isin(ok)]
    m = sub.merge(sub, on="fp")
    m = m[m["doc_id_x"] > m["doc_id_y"]]
    pc_ = m.groupby(["doc_id_x", "doc_id_y"]).size()
    want = sorted(pc_[pc_ >= min_shared].index.tolist())

    def pairs(ds):
        out = winnow_dup_pairs(
            ds, k=k, w=w, min_shared=min_shared, max_df=max_df,
            num_shards=4, pair_buckets=2,
        ).to_pandas()
        return sorted(map(tuple, out[["doc_id", "dup_of"]].to_numpy()))

    got_one = pairs(rd.from_arrow(tbl))                  # markers trigger
    got_many = pairs(rd.from_arrow(tbl).repartition(20)) # per-block df < cap
    assert got_one == want
    assert got_many == want
    assert (101, 100) in want                            # the rare dup survives


def test_dsl_filter_expr_and_limit(ray_session):
    import pyarrow as pa

    from vaero_ray.dsl import Vaero
    from vaero_ray.runner import run_batch

    tbl = pa.table({"v": pa.array(range(100), pa.int64())})
    Vaero.reset()
    Vaero().source("parquet", path="unused").filter_expr("v >= 90").limit(4).sink("stdout")
    graph = Vaero.start()
    Vaero.reset()
    out = next(iter(run_batch(graph, source_data=tbl).values())).to_pandas()
    assert len(out) == 4 and (out["v"] >= 90).all()


def test_unique_per_seg_packed_vs_lexsort():
    """The packed-int64 fast path equals the lexsort reference for int64
    inputs; uint64 (the 64-bit shingle hashes) and wide int64 inputs take
    the fallback and agree too."""
    from vaero_ray.stages.dedup import _unique_per_seg

    rng = np.random.default_rng(0)
    for dtype, hi in [(np.int64, 1 << 40), (np.uint64, 1 << 63), (np.int64, 1 << 62)]:
        counts = rng.integers(0, 30, size=200)
        vals = rng.integers(0, hi, size=int(counts.sum()), dtype=dtype)
        v, o = _unique_per_seg(vals.copy(), counts)
        seg = np.repeat(np.arange(200), counts)
        order = np.lexsort((vals, seg))
        vs, ss = vals[order], seg[order]
        first = np.ones(len(vs), bool)
        first[1:] = (vs[1:] != vs[:-1]) | (ss[1:] != ss[:-1])
        refo = np.zeros(201, np.int64)
        np.cumsum(np.bincount(ss[first], minlength=200), out=refo[1:])
        assert np.array_equal(v.astype(np.uint64), vs[first].astype(np.uint64))
        assert np.array_equal(o, refo)
