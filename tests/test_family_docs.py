"""Family docs can never silently stale again (VERDICT r4 item 2).

The reference ships a README with a frozen sample log for every kernel
dir (e.g. kernels/layer-norm/README.md:27-40) whose contract is that a
user can diff their output against it. docs/families/ is the analog;
these tests pin the two failure modes round 2-4 kept re-finding:

1. a doc existing for fewer families than the registry serves (25/27),
   or a doc's variant table disagreeing with the live registry;
2. a frozen log row claiming impossible physics (>100% of a hardware
   roofline — a tunnel timing glitch frozen as an expectation, e.g.
   the 1416 GB/s layer_norm row on an 819 GB/s part).
"""

import os
import re

import pytest

import tpukern.models  # noqa: F401  (registers model-side families)
import tpukern.ops  # noqa: F401
from tpukern.core import registry

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs", "families")


def _doc_families():
    import tools.gen_family_docs as gen
    return sorted(gen.COMMANDS)


def test_every_documented_family_has_a_doc():
    fams = _doc_families()
    missing = [f for f in fams
               if not os.path.exists(os.path.join(DOCS, f"{f}.md"))]
    assert not missing, f"families without docs: {missing}"


def test_doc_covers_every_registry_family():
    # every registry family with variants must be in the generator map
    # (a new op module can't ship without joining the doc pipeline)
    fams = set(_doc_families())
    live = {f for f in registry.families() if registry.variants(f)}
    # model-side families documented elsewhere (serving/batcher docs)
    undocumented = live - fams
    assert not undocumented, (
        f"registry families missing from gen_family_docs.COMMANDS: "
        f"{sorted(undocumented)}")


@pytest.mark.parametrize("family", sorted(
    f for f in registry.families() if registry.variants(f)))
def test_doc_variant_table_matches_registry(family):
    path = os.path.join(DOCS, f"{family}.md")
    assert os.path.exists(path), f"{family}.md missing"
    text = open(path).read()
    m = re.search(r"## Variants \((\d+)\)", text)
    assert m, f"{family}.md has no variant-count header"
    live = registry.variants(family)
    assert int(m.group(1)) == len(live), (
        f"{family}.md freezes {m.group(1)} variants, registry has "
        f"{len(live)} — re-run tools/gen_family_docs.py")
    listed = set(re.findall(r"^\| `([^`]+)` \|", text, re.M))
    assert listed == set(live), (
        f"{family}.md variant table != registry: "
        f"doc-only={sorted(listed - set(live))}, "
        f"missing={sorted(set(live) - listed)}")


_ROOF = re.compile(r"roofline:\s*([0-9.]+)%")


@pytest.mark.parametrize("family", sorted(
    f for f in registry.families() if registry.variants(f)))
def test_doc_frozen_log_respects_physics(family):
    path = os.path.join(DOCS, f"{family}.md")
    assert os.path.exists(path), f"{family}.md missing"
    bad = [ln for ln in open(path) if (m := _ROOF.search(ln))
           and float(m.group(1)) > 100.0]
    assert not bad, (
        f"{family}.md freezes physically impossible rows (>100% of "
        f"roofline — timing glitches must be dropped, not published): "
        f"{bad}")
