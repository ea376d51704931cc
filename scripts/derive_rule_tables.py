"""Re-derive the declarative rule tables from the reference's public data files.

Reads /root/reference (read-only) and writes restructured JSON tables under
osm_wikidata_ray/data/.  The *content* is the reference's public,
declarative configuration (category->tag rules, P31->extra-tag map,
embassy country names); the *structure* is this engine's own schema.

Run once at build time; outputs are committed.

Sources:
  - /root/reference/data/entity_types.json   (214 entity-type rules)
  - /root/reference/matcher/wikidata.py:66-251  (extra_keys dict)
  - /root/reference/matcher/embassy.py:7-891    (embassy country names)
"""

import ast
import json
import pathlib

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "osm_wikidata_ray" / "data"


def derive_type_rules() -> None:
    src = json.load(open(REF / "data" / "entity_types.json"))
    rules = []
    for e in src:
        rule = {
            "categories": sorted(e.get("cats", [])),
            "osm_tags": sorted(e.get("tags", [])),
            "trim_endings": sorted(e.get("trim", [])),
            "max_dist_km": e.get("dist"),
        }
        if e.get("wikidata"):
            rule["qid"] = e["wikidata"]
        if e.get("check_housename"):
            rule["housename"] = True
        if e.get("exclude_cats"):
            rule["exclude_categories"] = sorted(e["exclude_cats"])
        rules.append(rule)
    rules.sort(key=lambda r: (r["categories"], r["osm_tags"]))
    json.dump(
        {"default_max_dist_km": 4, "rules": rules},
        open(OUT / "type_rules.json", "w"),
        indent=1,
        ensure_ascii=False,
    )


def _extract_dict_literal(path: pathlib.Path, var: str) -> dict:
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == var:
                    # resolve simple Name refs (e.g. `edu`, `tall`) first
                    names: dict[str, object] = {}
                    for n2 in ast.walk(tree):
                        if isinstance(n2, ast.Assign) and isinstance(
                            n2.value, (ast.List, ast.Dict, ast.Constant)
                        ):
                            for t2 in n2.targets:
                                if isinstance(t2, ast.Name):
                                    try:
                                        names[t2.id] = ast.literal_eval(n2.value)
                                    except ValueError:
                                        pass

                    class Resolver(ast.NodeTransformer):
                        def visit_Name(self, n: ast.Name):  # noqa: N802
                            if n.id in names:
                                return ast.copy_location(
                                    ast.Constant(value=names[n.id]), n
                                )
                            return n

                    resolved = Resolver().visit(node.value)
                    ast.fix_missing_locations(resolved)
                    return ast.literal_eval(resolved)
    raise KeyError(var)


def derive_extra_type_tags() -> None:
    raw = _extract_dict_literal(REF / "matcher" / "wikidata.py", "extra_keys")
    out = {}
    for qid, tags in sorted(raw.items()):
        clean = []
        for t in tags:
            if not t:
                continue
            if t.startswith(("Key:", "Tag:")):
                t = t[4:]
            clean.append(t)
        out[qid] = sorted(set(clean))
    json.dump(out, open(OUT / "extra_type_tags.json", "w"), indent=1)


def derive_embassy_countries() -> None:
    raw = _extract_dict_literal(REF / "matcher" / "embassy.py", "countries")
    # reference shape: {numeric_item_id: [country name variants]}
    out = {f"Q{item_id}": sorted(set(names)) for item_id, names in raw.items()}
    json.dump(out, open(OUT / "embassy_countries.json", "w"), indent=1, ensure_ascii=False)


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    derive_type_rules()
    derive_extra_type_tags()
    try:
        derive_embassy_countries()
    except KeyError as e:
        print("embassy extraction failed:", e)
    for f in sorted(OUT.glob("*.json")):
        print(f, f.stat().st_size)
