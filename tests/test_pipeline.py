"""End-to-end linkage pipeline tests on the synthetic corpus.

Gates (BASELINE.md): pairwise F1 ≥ 0.99 vs gold labels at the same blocking
keys; per-row span-sequence checksum equality; engine == single-process
oracle; resume skips completed stages.
"""

import json

import pytest

from osm_wikidata_ray.sources.oracle import oracle_accepted_pairs, pairwise_f1
from osm_wikidata_ray.sources.synth import corpus_checksums, generate_corpus

N_DOCS = 320


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS)


@pytest.fixture(scope="module")
def linkage_result(ray_session, corpus):
    from osm_wikidata_ray.pipelines.linkage import run_linkage

    docs, _gold = corpus
    ds = ray_session.data.from_items(docs).repartition(8)
    return run_linkage(
        ds, with_clusters=True, hot_key_threshold=100, salt_factor=4,
        scorer_concurrency=(1, 2),
    )


def test_pairwise_f1_vs_gold(linkage_result, corpus):
    _docs, gold = corpus
    acc = linkage_result.accepted.to_pandas()
    pred = {(r.qid, r.osm_type, r.osm_id) for r in acc.itertuples()}
    gold_match = {
        (g["qid"], g["osm_type"], g["osm_id"]) for g in gold if g["label"] == "match"
    }
    gold_non = {
        (g["qid"], g["osm_type"], g["osm_id"]) for g in gold if g["label"] == "nonmatch"
    }
    scores = pairwise_f1(pred, gold_match)
    assert scores["f1"] >= 0.99, scores
    assert not (pred & gold_non), "engine accepted a planted nonmatch"


def test_engine_matches_oracle(linkage_result, corpus):
    docs, _gold = corpus
    acc = linkage_result.accepted.to_pandas()
    pred = {(r.qid, r.osm_type, r.osm_id) for r in acc.itertuples()}
    oracle = {
        (p["qid"], p["osm_type"], p["osm_id"]) for p in oracle_accepted_pairs(docs)
    }
    assert pred == oracle


def test_span_checksum_invariant(ray_session, linkage_result, corpus):
    """Checksums carried through parse→pairs→candidates equal re-computed
    source checksums (kind, text, media_ref, order preserved)."""
    docs, _gold = corpus
    source = corpus_checksums(docs)
    acc = linkage_result.accepted.to_pandas()
    assert len(acc) > 0
    for r in acc.itertuples():
        assert source[r.wd_doc_id] == r.wd_checksum
        assert source[r.osm_doc_id] == r.osm_checksum

    from osm_wikidata_ray.pipelines.linkage import verify_spans

    ds = ray_session.data.from_items(docs).repartition(4)
    sink = verify_spans(ds).to_pandas()
    assert len(sink) == len(docs)
    for r in sink.itertuples():
        assert source[r.doc_id] == r.span_checksum


def test_clusters_cover_accepted_pairs(linkage_result):
    acc = linkage_result.accepted.to_pandas()
    cl = linkage_result.clusters.to_pandas()
    label = dict(zip(cl.node, cl.cluster_id))
    for r in acc.itertuples():
        assert label[r.qid] == label[f"{r.osm_type}/{r.osm_id}"]
    # 1:1-filtered pairs → all components have exactly 2 nodes
    sizes = cl.groupby("cluster_id").size()
    assert (sizes == 2).all()


def test_connected_components_general(ray_session):
    """Transitive closure is general: a 4-node chain collapses to one
    cluster (not just the 1:1 size-2 case)."""
    import pyarrow as pa

    from osm_wikidata_ray.stages.clustering import connected_components

    pairs = ray_session.data.from_arrow(
        pa.table(
            {
                "qid": ["Q1", "Q1", "Q2"],
                "osm_type": ["node", "way", "way"],
                "osm_id": [1, 2, 2],
            }
        )
    )
    cl = connected_components(pairs, num_partitions=2).to_pandas()
    assert cl.cluster_id.nunique() == 1
    assert set(cl.node) == {"Q1", "Q2", "node/1", "way/2"}


def test_hot_key_salting(ray_session, corpus):
    """The San Jose block is detected as hot and still resolves correctly."""
    from osm_wikidata_ray.pipelines.linkage import run_linkage
    from osm_wikidata_ray.sources.synth import generate_scenario

    s = generate_scenario(97)  # hot-key scenario
    assert s.family == "hot_key"
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]
    ds = ray_session.data.from_items(docs).repartition(2)
    res = run_linkage(
        ds, with_clusters=False, hot_key_threshold=20, salt_factor=4,
        scorer_concurrency=(1, 2),
    )
    assert any(k.startswith("n:sanjose") or k.startswith("n:san") for k in res.hot_keys)
    acc = res.accepted.to_pandas()
    gold_match = {
        (g["qid"], g["osm_type"], g["osm_id"]) for g in s.gold if g["label"] == "match"
    }
    assert {(r.qid, r.osm_type, r.osm_id) for r in acc.itertuples()} == gold_match


def test_resume_skips_completed_stages(ray_session, corpus, tmp_path):
    from osm_wikidata_ray.pipelines.linkage import run_linkage

    docs, _gold = corpus
    ds = ray_session.data.from_items(docs[:60]).repartition(2)
    ck = str(tmp_path / "ckpt")

    res1 = run_linkage(ds, checkpoint_dir=ck, with_clusters=False,
                       scorer_concurrency=(1, 2))
    n1 = res1.accepted.count()

    res2 = run_linkage(ds, checkpoint_dir=ck, with_clusters=False,
                       scorer_concurrency=(1, 2))
    n2 = res2.accepted.count()
    assert n1 == n2

    events = [
        json.loads(line)
        for line in open(f"{ck}/metrics.jsonl")
    ]
    stages = [e for e in events if e["event"] == "resume-skip"]
    assert {e["stage"] for e in stages} >= {"records", "candidates", "resolved"}
    manifest = json.loads(open(f"{ck}/candidates.MANIFEST.json").read())
    assert manifest["complete"] and manifest["partitions"]


def test_metrics_and_export(ray_session, linkage_result, corpus, tmp_path):
    """place+items+candidates export (reference export.py:1-103): the
    nested items JSON round-trips the candidates view exactly, items carry
    their isa lists, and place.json holds the run summary."""
    from osm_wikidata_ray.pipelines.linkage import export_json, match_ratio

    metrics = match_ratio(linkage_result)
    assert metrics["accepted_count"] > 0
    assert 0 < metrics["match_ratio"] <= 1.0

    docs, _gold = corpus
    ds = ray_session.data.from_items(docs).repartition(4)
    export_json(linkage_result, str(tmp_path / "export"), docs=ds)
    import glob
    import json as _json

    place = _json.loads(open(tmp_path / "export" / "place.json").read())["place"]
    assert place["item_count"] == metrics["item_count"]
    assert place["candidate_count"] == metrics["candidate_count"]
    assert {f["qid"] for f in place["isa_facets"]} >= {"Q55488", "Q46831"}

    files = glob.glob(str(tmp_path / "export" / "items" / "*.json"))
    assert files
    items = [
        _json.loads(line) for f in files for line in open(f) if line.strip()
    ]
    # round-trip: flattened nested candidates == the candidates view
    got = {
        (it["qid"], c["osm_type"], c["osm_id"], round(c["dist"], 6), c["chosen"])
        for it in items
        for c in it["candidates"]
    }
    cand = linkage_result.candidates.to_pandas()
    want = {
        (r.qid, r.osm_type, r.osm_id, round(r.dist, 6), r.chosen)
        for r in cand.itertuples()
    }
    assert got == want
    assert len(items) == metrics["item_count"]


def test_export_items_carry_isa(ray_session, tmp_path):
    """An exported item with a planted P31 lists it in `isa`
    (reference export.py:95-100 ItemIsA attach)."""
    import glob
    import json as _json
    import random

    from osm_wikidata_ray.pipelines.linkage import export_json, run_linkage
    from osm_wikidata_ray.sources.synth import _Scenario

    s = _Scenario(9000, random.Random("isa-export"))
    name = f"{s.stem} railway station"
    q = s.add_wd({name: [("label", "en")]}, ["railway=station"], isa=["Q55488"])
    s.add_osm({"name": name, "railway": "station"}, north_m=40)
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]
    ds = ray_session.data.from_items(docs).repartition(2)
    res = run_linkage(ds, with_clusters=False, scorer_concurrency=(1, 2))
    export_json(res, str(tmp_path / "exp"), docs=ds)
    items = [
        _json.loads(line)
        for f in glob.glob(str(tmp_path / "exp" / "items" / "*.json"))
        for line in open(f) if line.strip()
    ]
    by_qid = {it["qid"]: it for it in items}
    assert by_qid[q]["isa"] == ["Q55488"]
    assert by_qid[q]["candidates"][0]["chosen"]
    place = _json.loads(open(tmp_path / "exp" / "place.json").read())["place"]
    # super-classes ride the facet list too (min_count=1 in the export)
    assert {f["qid"] for f in place["isa_facets"]} >= {"Q55488", "Q719456"}


def test_isa_facets_and_lang_counts(ray_session, corpus):
    from osm_wikidata_ray.pipelines.linkage import isa_facet_counts, language_counts

    docs, _ = corpus
    ds = ray_session.data.from_items(docs).repartition(4)
    langs = language_counts(ds)  # small pandas DataFrame
    assert "en" in set(langs["lang"])
    # reference semantics: sub-10% tail languages are cut (the de/sv labels
    # planted by fam_exact/fam_case are ~4% of items), en always survives
    assert set(langs["lang"]) == {"en"}, langs
    facets = isa_facet_counts(ds).to_pandas()
    assert "Q55488" in set(facets["isa"])  # station scenarios plant P31


def test_reject_reasons_surface(ray_session):
    """With keep_rejects the scorer emits veto reasons as rows (reference
    check_item_candidate reject strings, matcher.py:995-1135)."""
    from osm_wikidata_ray.pipelines.linkage import run_linkage
    from osm_wikidata_ray.sources.synth import FAMILIES, generate_scenario

    idx = next(i for i, (name, _) in enumerate(FAMILIES) if name == "parking")
    s = generate_scenario(idx)
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]
    ds = ray_session.data.from_items(docs).repartition(2)
    res = run_linkage(ds, with_clusters=False, keep_rejects=True,
                      scorer_concurrency=(1, 2))
    cands = res.candidates.to_pandas()
    notes = set(cands["note"])
    assert any(n.startswith("reject:") for n in notes), notes
    assert "reject: parking only matches parking" in notes


def test_pipeline_deterministic(ray_session, corpus):
    """Two independent runs over the same docs produce identical accepted
    sets (stable hashing, no PYTHONHASHSEED leakage, deterministic caps)."""
    from osm_wikidata_ray.pipelines.linkage import run_linkage

    docs, _ = corpus
    subset = docs[:120]

    def run_once():
        ds = ray_session.data.from_items(subset).repartition(3)
        res = run_linkage(ds, with_clusters=False, hot_key_threshold=100,
                          salt_factor=4, scorer_concurrency=(1, 2))
        acc = res.accepted.to_pandas()
        return sorted((r.qid, r.osm_type, r.osm_id, round(r.dist, 6))
                      for r in acc.itertuples())

    assert run_once() == run_once()


def test_want_isa_skips_stub_items(ray_session):
    """skip_item_during_match gating (reference place.py:1198-1200 →
    model.py:972-1006): with a want_isa filter, a cebwiki-only stub outside
    the filter is skipped before matching; without want_isa it matches."""
    from osm_wikidata_ray.pipelines.linkage import run_linkage
    from osm_wikidata_ray.sources.oracle import oracle_accepted_pairs
    from osm_wikidata_ray.sources.synth import _Scenario
    import random

    s = _Scenario(5000, random.Random("skip"))
    # a museum inside want_isa — always matched
    q_museum = s.add_wd(
        {f"{s.stem} Museum": [("label", "en")]}, ["tourism=museum"],
        n=0, isa=["Q33506"],
    )
    o_museum = s.add_osm({"name": f"{s.stem} Museum", "tourism": "museum"},
                         north_m=40)
    # a cebwiki-only stub outside want_isa — skipped only under the filter
    q_stub = s.add_wd(
        {f"{s.stem} Bukid": [("label", "ceb"), ("sitelink", "cebwiki")]},
        ["natural=peak"], n=1, east_m=900, isa=["Q54050"],
    )
    o_stub = s.add_osm({"name": f"{s.stem} Bukid", "natural": "peak"},
                       east_m=940)
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]

    def run(want_isa):
        ds = ray_session.data.from_items(docs).repartition(2)
        res = run_linkage(ds, with_clusters=False, scorer_concurrency=(1, 2),
                          want_isa=want_isa)
        acc = res.accepted.to_pandas()
        return {(r.qid, f"{r.osm_type}/{r.osm_id}") for r in acc.itertuples()}

    unfiltered = run(None)
    assert unfiltered == {(q_museum, o_museum), (q_stub, o_stub)}
    filtered = run({"Q33506"})
    assert filtered == {(q_museum, o_museum)}

    # oracle mirrors the gating
    oracle = {
        (p["qid"], f"{p['osm_type']}/{p['osm_id']}")
        for p in oracle_accepted_pairs(docs, want_isa={"Q33506"})
    }
    assert oracle == filtered


def test_blocking_recall_on_rewrite_pairs():
    """Adversarial blocking recall: pairs that match only through rule-
    cascade rewrites (no shared raw token) must still share a blocking key.
    Reports recall over the adversarial set — the gap ADVICE.md flagged
    between name-key blocking and the reference's spatial candidate SQL."""
    from osm_wikidata_ray.functions.keys import osm_block_keys, wd_block_keys
    from osm_wikidata_ray.rules.names import name_match

    adversarial = [
        # (wd name, osm name) — every token rewritten by tidy_name
        ("Mount No. 4", "Mt Number 4"),
        ("Saint Fiacre's", "St Fiacre"),
        ("Mount Saint Helena", "Mt St Helena"),
    ]
    found = 0
    for wd_name, osm_name in adversarial:
        assert name_match(osm_name, wd_name), (osm_name, wd_name)
        wd_keys = set(wd_block_keys({"names": {wd_name: [("label", "en")]}},
                                    with_geo=False))
        osm_keys = set(osm_block_keys({"name": osm_name}))
        if wd_keys & osm_keys:
            found += 1
    recall = found / len(adversarial)
    assert recall == 1.0, f"blocking recall on rewrite pairs: {recall}"


def test_osm_language_counts(ray_session):
    """OSM-side name:xx language counts over candidate rows (reference
    languages_osm place.py:1061-1076 / ItemCandidate.languages)."""
    import random

    from osm_wikidata_ray.pipelines.linkage import osm_language_counts, run_linkage
    from osm_wikidata_ray.sources.synth import _Scenario

    s = _Scenario(6000, random.Random("osm-langs"))
    name = f"{s.stem} Chapel"
    s.add_wd({name: [("label", "en")]},
             ["amenity=place_of_worship", "religion=christian"])
    s.add_osm(
        {"name": name, "name:fr": f"Chapelle {s.stem}", "name:de": name,
         "amenity": "place_of_worship", "religion": "christian"},
        osm_type="way", north_m=40,
    )
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]
    ds = ray_session.data.from_items(docs).repartition(2)
    res = run_linkage(ds, with_clusters=False, scorer_concurrency=(1, 2))
    langs = osm_language_counts(res.candidates).to_pandas()
    counts = dict(zip(langs["lang"], langs["sum(n)"]))
    assert counts == {"fr": 1, "de": 1}, counts


def test_corpus_blocking_recall(corpus):
    """Corpus-level blocking recall over all gold match pairs = 1.0 —
    every planted pair is discoverable at the blocking stage (reported
    separately from F1 per ADVICE.md)."""
    from osm_wikidata_ray.sources.oracle import blocking_recall

    docs, gold = corpus
    rep = blocking_recall(docs, gold)
    assert rep["recall"] == 1.0, rep["missed"][:5]


def test_bad_qids_gate(ray_session):
    """Items with recorded bad matches are reported, never accepted
    (reference filter_candidates_more bad gate, matcher.py:1445-1447)."""
    import random

    from osm_wikidata_ray.pipelines.linkage import run_linkage
    from osm_wikidata_ray.sources.oracle import oracle_accepted_pairs
    from osm_wikidata_ray.sources.synth import _Scenario

    s = _Scenario(7000, random.Random("bad"))
    name = f"{s.stem} Forge"
    q = s.add_wd({name: [("label", "en")]}, ["craft=blacksmith"])
    s.add_osm({"name": name, "craft": "blacksmith"}, north_m=30)
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]
    ds = ray_session.data.from_items(docs).repartition(2)

    res = run_linkage(ds, with_clusters=False, scorer_concurrency=(1, 2),
                      bad_qids={q})
    resolved = res.resolved.to_pandas()
    assert len(resolved) == 1
    assert not resolved["accepted"].iloc[0]
    assert resolved["note"].iloc[0] == "has bad match"
    assert res.accepted.count() == 0
    assert oracle_accepted_pairs(docs, bad_qids={q}) == []
    # without the gate the pair is accepted
    res2 = run_linkage(ds, with_clusters=False, scorer_concurrency=(1, 2))
    assert res2.accepted.count() == 1


def test_within_polygon_place_names(ray_session):
    """§2.4 #38 (reference get_within_names, matcher.py:582-599 + 712,720):
    with hunt_for_more_place_names on, names of place/tourism polygons
    containing a candidate augment the item's place_names, enabling the
    reference's "Main Street Station" ↔ "Richmond Main Street Station"
    match (test_match.py:326-330).  Flag off (the reference default): no
    match.  Engine == serial oracle under both settings."""
    import math
    import random

    from osm_wikidata_ray.pipelines.linkage import run_linkage
    from osm_wikidata_ray.sources.oracle import oracle_accepted_pairs
    from osm_wikidata_ray.sources.synth import _Scenario

    s = _Scenario(7100, random.Random("within"))
    q = s.add_wd(
        {"Richmond Main Street Station": [("label", "en")]},
        ["railway=station"],
    )
    s.add_osm({"name": "Main Street Station", "railway": "station"},
              north_m=40)
    # the containing city polygon: equal-area disc radius 500 m
    s.add_osm(
        {"name": "Richmond City", "place": "city",
         "way_area": str(math.pi * 500.0**2)},
        osm_type="way", north_m=10,
    )
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]

    def run(flag):
        ds = ray_session.data.from_items(docs).repartition(2)
        res = run_linkage(
            ds, with_clusters=False, scorer_concurrency=(1, 2),
            ruleset_kwargs={"hunt_for_more_place_names": flag},
        )
        return sorted(
            (r.qid, r.osm_type, r.osm_id)
            for r in res.accepted.to_pandas().itertuples()
        )

    from osm_wikidata_ray.rules.ruleset import RuleSet

    def run_oracle(flag):
        pairs = oracle_accepted_pairs(
            docs, ruleset=RuleSet(hunt_for_more_place_names=flag)
        )
        return sorted((p["qid"], p["osm_type"], p["osm_id"]) for p in pairs)

    on_engine, off_engine = run(True), run(False)
    assert off_engine == [] == run_oracle(False)
    assert len(on_engine) == 1 and on_engine[0][0] == q
    assert on_engine == run_oracle(True)


def test_within_place_names_rules():
    """rules/within.py unit semantics: equal-area disc containment,
    place/tourism tag filter, way_area requirement, self-row exclusion."""
    from osm_wikidata_ray.geo import offset_latlon
    from osm_wikidata_ray.rules.within import (
        collect_place_polygons,
        polygon_radius_m,
        within_place_names,
    )

    lat, lon = 51.0, -2.3
    near = offset_latlon(lat, lon, 300.0, 0.0)
    far = offset_latlon(lat, lon, 900.0, 0.0)
    poly = {
        "osm_type": "way", "osm_id": 1, "lat": lat, "lon": lon,
        "planet_table": "polygon",
        "tags": {"name": "Village", "place": "village",
                 "way_area": str(3.14159265 * 500.0**2)},
    }
    no_area = {**poly, "osm_id": 2, "tags": {"name": "X", "place": "town"}}
    not_place = {**poly, "osm_id": 3,
                 "tags": {"name": "Y", "landuse": "forest",
                          "way_area": "1000000"}}
    node = {"osm_type": "node", "osm_id": 9,
            "lat": near[0], "lon": near[1], "planet_table": "point",
            "tags": {"name": "Shop"}}

    polys = collect_place_polygons([poly, no_area, not_place, node])
    assert [p["osm_id"] for p in polys] == [1]
    assert abs(polys[0]["radius_m"] - 500.0) < 1.0
    assert polygon_radius_m({"way_area": "0"}) is None
    assert polygon_radius_m({"way_area": "bogus"}) is None

    inside = {"osm_type": "node", "osm_id": 9, "lat": near[0], "lon": near[1]}
    outside = {"osm_type": "node", "osm_id": 10, "lat": far[0], "lon": far[1]}
    itself = {"osm_type": "way", "osm_id": 1, "lat": lat, "lon": lon}
    assert within_place_names(inside, polys) == {"Village"}
    assert within_place_names(outside, polys) == set()
    assert within_place_names(itself, polys) == set()  # self-row excluded


def test_driver_entry_smoke(ray_session):
    """The driver's entry() contract: runs on sf0.001, returns rows with
    the stable (qid, osm_type, osm_id) schema."""
    import __ray_entry__ as entry_mod

    res = entry_mod.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert list(df.columns) == ["qid", "osm_type", "osm_id"]


def test_thin_exchange_cols(ray_session):
    """The blocking exchange ships no strings: key hashes are stable and
    distinct per distinct key, side maps to a bool, bucket ids are in
    range."""
    import pyarrow as pa

    from osm_wikidata_ray.stages import blocking

    batch = pa.table(
        {
            "block_key": ["name:x", "name:y", "name:x", "addr:1 a st"],
            "side": ["wd", "osm", "osm", "wd"],
            "entity_key": pa.array([1, 2, 3, 4], pa.int64()),
            "lat": [0.0, 0.0, 0.0, 0.0],
            "lon": [0.0, 0.0, 0.0, 0.0],
            "max_dist_m": [100.0] * 4,
            "is_point": [True, False, True, False],
        }
    )
    out = blocking.thin_exchange_cols(batch, n_buckets=7)
    kh = out.column("key_hash").to_pylist()
    assert kh[0] == kh[2] and kh[0] != kh[1] and kh[0] != kh[3]
    assert out.column("is_wd").to_pylist() == [True, False, False, True]
    assert all(0 <= b < 7 for b in out.column("bucket_part").to_pylist())
    assert out.schema.field("key_hash").type == pa.int64()
    # identical input → identical hashes in a fresh call (cross-process
    # stability is pinned by pd.util.hash_array's fixed siphash key)
    again = blocking.thin_exchange_cols(batch, n_buckets=7)
    assert again.column("key_hash").to_pylist() == kh


def test_resolve_conflicts_exchange_fallback_matches_broadcast(linkage_result):
    """Forcing the >cap uid-bucketed exchange path must reproduce the
    broadcast gate exactly (same accepted set, same notes)."""
    from osm_wikidata_ray.stages.clustering import resolve_conflicts

    cols = ["qid", "osm_type", "osm_id", "note", "accepted"]
    base = (
        resolve_conflicts(linkage_result.candidates)
        .to_pandas()[cols]
        .sort_values(cols[:3])
        .reset_index(drop=True)
    )
    # cap below any possible conflict-set size → exchange branch
    alt = (
        resolve_conflicts(linkage_result.candidates, conflict_broadcast_cap=-1)
        .to_pandas()[cols]
        .sort_values(cols[:3])
        .reset_index(drop=True)
    )
    assert len(base) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(base, alt)


def test_resolve_conflicts_exchange_flags_conflict(ray_session):
    """A multiply-claimed OSM object is rejected on BOTH gate paths
    (broadcast and uid-bucketed exchange) with the same note."""
    import random

    from osm_wikidata_ray.pipelines.linkage import run_linkage
    from osm_wikidata_ray.sources.synth import _Scenario
    from osm_wikidata_ray.stages.clustering import resolve_conflicts

    s = _Scenario(8000, random.Random("conflict"))
    name = f"{s.stem} Mill"
    s.add_wd({name: [("label", "en")]}, ["man_made=windmill"], n=0)
    s.add_wd({name: [("label", "en")]}, ["man_made=windmill"], n=1, east_m=15)
    s.add_osm({"name": name, "man_made": "windmill"}, north_m=30)
    docs = [{"doc_id": d, "spans": sp} for d, sp in s.docs]
    ds = ray_session.data.from_items(docs).repartition(2)
    res = run_linkage(ds, with_clusters=False, scorer_concurrency=(1, 2))

    note = "OSM candidate matches multiple Wikidata items"
    for cap in (None, -1):  # broadcast path, exchange path
        kw = {} if cap is None else {"conflict_broadcast_cap": cap}
        resolved = resolve_conflicts(res.candidates, **kw).to_pandas()
        assert len(resolved) == 2
        assert (resolved["note"] == note).all()
        assert not resolved["accepted"].any()


def test_connected_components_long_chain_and_ring(ray_session):
    """Hash-to-min shortcut edges give O(log diameter) convergence: a
    40-qid ring (80 graph nodes — the ring-paired mega-cluster shape)
    collapses to one cluster in ~7 label rounds; one-hop propagation
    would need ~40 and overrun max_rounds."""
    import pyarrow as pa

    from osm_wikidata_ray.stages.clustering import connected_components

    # path: Q0-node/0-Q1-node/1-...  (each pair row links Qi to node/i,
    # and Qi+1 to node/i too, chaining)
    n = 40
    qid, ot, oid = [], [], []
    for i in range(n):
        qid += [f"Q{i:04d}", f"Q{(i + 1) % n:04d}"]  # ring closure at i=n-1
        ot += ["node", "node"]
        oid += [i, i]
    pairs = ray_session.data.from_arrow(
        pa.table({"qid": qid, "osm_type": ot, "osm_id": oid})
    ).repartition(8)
    cl = connected_components(pairs).to_pandas()
    assert cl.cluster_id.nunique() == 1
    assert len(cl) == 2 * n  # n qids + n osm nodes
    assert cl.cluster_id.iloc[0] == "Q0000"


def test_connected_components_int_branch_parity(ray_session):
    """connected_components_int's size-guarded driver union-find and the
    distributed min-label fallback label identical components (CLAUDE.md:
    every guarded driver fast path needs both branches parity-tested).
    Graph: chains + a ring + singleton-free pairs, deterministic."""
    import numpy as np
    import pyarrow as pa

    from osm_wikidata_ray.stages.clustering import connected_components_int

    rng = np.random.RandomState(7)
    # three chains of 50 + a 30-ring + random extra intra-chain edges
    a, b = [], []
    for base in (0, 1000, 2000):
        a += list(range(base, base + 49))
        b += list(range(base + 1, base + 50))
    a += [3000 + i for i in range(30)]
    b += [3000 + (i + 1) % 30 for i in range(30)]
    extra = rng.randint(0, 49, size=(20, 2))
    a += (extra[:, 0] + 1000).tolist()
    b += (extra[:, 1] + 1000).tolist()
    edges = ray_session.data.from_arrow(
        pa.table({"doc_a": pa.array(a, pa.int64()),
                  "doc_b": pa.array(b, pa.int64())})
    ).repartition(6)
    fast = (
        connected_components_int(edges).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    dist = (
        connected_components_int(edges, driver_edge_cap=0).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    assert fast.equals(dist)
    assert fast.cluster_id.nunique() == 4
    assert set(fast.cluster_id) == {0, 1000, 2000, 3000}


def test_verify_run_distributed(ray_session, tmp_path):
    """cmd_verify's engine (cli.verify_run) is a bucketed co-partitioned
    anti-join — green on an intact run, ≥1 mismatch after corrupting one
    carried checksum, and the driver only ever sees per-bucket counts."""
    import glob

    import pyarrow.parquet as pq

    from osm_wikidata_ray.cli import verify_run
    from osm_wikidata_ray.pipelines.linkage import read_docs, run_linkage
    from osm_wikidata_ray.sources.synth import write_corpus_parquet

    path = str(tmp_path / "docs.parquet")
    n_docs, _ = write_corpus_parquet(path, None, 120)
    ck = str(tmp_path / "run")
    run_linkage(
        read_docs(path), checkpoint_dir=ck, with_clusters=False,
        scorer_concurrency=(1, 2),
    )

    docs, bad = verify_run(path, ck)
    assert (docs, bad) == (n_docs, 0)

    # flip one carried checksum in one candidates partition
    part = sorted(glob.glob(f"{ck}/candidates/**/*.parquet", recursive=True))[0]
    t = pq.read_table(part)
    cks = t.column("wd_checksum").to_pylist()
    cks[0] = "0" * len(cks[0])
    t = t.set_column(
        t.column_names.index("wd_checksum"), "wd_checksum",
        __import__("pyarrow").array(cks, __import__("pyarrow").string()),
    )
    pq.write_table(t, part)

    docs2, bad2 = verify_run(path, ck)
    assert docs2 == n_docs and bad2 >= 1
