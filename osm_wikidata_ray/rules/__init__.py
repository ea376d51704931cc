"""Pure scoring rules (no Ray dependency).

The scalar rule library the Ray Data stages call into: name normalizers and
the match cascade (names.py), address & identifier checks (address.py),
category/tag expansion (tags.py), the veto catalogue (vetoes.py), and
candidate-list preference filters (reduce.py).  RuleSet (ruleset.py) compiles
the static tables once per actor.
"""
