"""Stress the bounded-error property suites far past their gate budgets.

The pytest gate runs each codec property with 10-40 Hypothesis examples —
enough to catch gross defects, small enough to keep the suite's wall time
sane. But a fresh Hypothesis run draws FRESH examples, so a latent
falsifying example (the round-4 Layer II class-0 envelope bug was exactly
this class) can stay hidden for rounds and then redden a gate run nobody
is watching. This job re-invokes each property's inner test body (via the
``.hypothesis.inner_test`` attribute Hypothesis exposes) with thousands of
uniformly-drawn parameter combinations over the SAME strategy domains the
test declares, in parallel worker processes.

Any failure prints the exact kwargs, ready to pin as an ``@example`` in
tests/test_properties.py next to a fix.

Usage:  python jobs/stress_properties.py [--per-test N] [--workers K]
Output: one line per test with pass/fail counts; nonzero exit on failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Parameter-domain table: mirrors each test's @given strategies exactly.
# (test name, {kwarg: domain}) where domain is a list (sampled_from) or an
# inclusive ("int", lo, hi) integer range, matching st.integers(lo, hi).
DOMAINS = {
    "test_layer2_roundtrip_property": {
        "seed": ("int", 0, 10_000),
        "levels": [5, 9, 15, 63, 255],
        "nch": [1, 2],
        "sr": [32000, 44100, 48000],
    },
    "test_layer2_matches_scalar_reference": {
        "seed": ("int", 0, 10_000),
        "levels": [5, 9, 15, 63],
        "sr": [32000, 44100, 48000],
    },
    "test_layer2_grouped_quantizer_error_bound": {
        "seed": ("int", 0, 10_000),
        "levels": [3, 5, 9],
    },
    "test_pack_bits_take_var_roundtrip_property": {
        "seed": ("int", 0, 10_000),
        "n": ("int", 1, 300),
    },
    "test_layer3_roundtrip_snr_property": {
        "seed": ("int", 0, 10_000),
        "quality": [300, 800, 1500, 4000],
        "sr": [32000, 44100, 48000],
    },
    "test_layer3_stereo_roundtrip_snr_property": {
        "seed": ("int", 0, 10_000),
        "quality": [300, 1500],
        "sr": [32000, 44100, 48000],
        "correlation": ["independent", "identical", "antiphase", "mixed"],
    },
    "test_h264_ipcm_roundtrip_property": {
        "seed": ("int", 0, 10_000),
        "w": ("int", 1, 20),
        "h": ("int", 1, 12),
        "n": ("int", 1, 3),
    },
    "test_h264_cavlc_roundtrip_property": {
        "seed": ("int", 0, 10_000),
        "w": ("int", 1, 3),
        "h": ("int", 1, 2),
        "qp": ("int", 0, 51),
        "mb_types": ["i16", "i4", "auto"],
    },
    "test_aac_roundtrip_snr_property": {
        "seed": ("int", 0, 10_000),
        "n": ("int", 64, 4000),
        "sr_idx": ("int", 0, 11),
        "quality": [30, 60, 150, 400],
    },
    "test_aac_stereo_roundtrip_snr_property": {
        "seed": ("int", 0, 10_000),
        "n": ("int", 64, 4000),
        "sr_idx": ("int", 0, 11),
        "quality": [30, 150],
        "correlation": ["independent", "identical", "antiphase", "mixed"],
    },
    "test_wav_roundtrip_property": {
        "seed": ("int", 0, 10_000),
        "n": ("int", 1, 5000),
        "rate": [8000, 16000, 44100],
    },
    "test_bmp_roundtrip_property": {
        "seed": ("int", 0, 10_000),
        "h": ("int", 1, 64),
        "w": ("int", 1, 64),
    },
    "test_png_roundtrip_property": {
        "seed": ("int", 0, 10_000),
        "h": ("int", 1, 64),
        "w": ("int", 1, 64),
    },
}


def _draw(rng: np.random.Generator, domain):
    if isinstance(domain, tuple) and domain[0] == "int":
        return int(rng.integers(domain[1], domain[2] + 1))
    return domain[int(rng.integers(0, len(domain)))]


def _run_case(task):
    """Worker: run one (test_name, kwargs) case; return (name, kwargs, err)."""
    name, kwargs = task
    try:
        import tests.test_properties as tp

        fn = getattr(tp, name)
        inner = getattr(getattr(fn, "hypothesis", None), "inner_test", fn)
        inner(**kwargs)
        return (name, kwargs, None)
    except Exception:
        return (name, kwargs, traceback.format_exc(limit=4))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-test", type=int, default=400)
    ap.add_argument("--workers", type=int, default=12)
    ap.add_argument("--master-seed", type=int, default=None,
                    help="fix for reproducibility; default = fresh entropy")
    ap.add_argument("--only", default=None, help="substring filter on test names")
    args = ap.parse_args()

    master = args.master_seed
    if master is None:
        master = int.from_bytes(os.urandom(4), "little")
    print(f"master_seed={master} per_test={args.per_test}", flush=True)
    rng = np.random.default_rng(master)

    tasks = []
    # Interleave tests so slow families don't serialize at the pool tail;
    # w/h ranges checked against the test file at import time below.
    for name, dom in DOMAINS.items():
        if args.only and args.only not in name:
            continue
        for _ in range(args.per_test):
            tasks.append((name, {k: _draw(rng, d) for k, d in dom.items()}))
    order = rng.permutation(len(tasks))
    tasks = [tasks[i] for i in order]

    # Fail fast if a domain drifted from the test file (e.g. a strategy was
    # widened but this table wasn't): verify each name still exists.
    import tests.test_properties as tp

    for name in DOMAINS:
        assert hasattr(tp, name), f"{name} missing from tests/test_properties.py"

    fails = {}
    counts = {}
    with Pool(args.workers) as pool:
        for name, kwargs, err in pool.imap_unordered(_run_case, tasks, chunksize=4):
            counts[name] = counts.get(name, 0) + 1
            if err is not None:
                fails.setdefault(name, []).append((kwargs, err))
                print(f"FAIL {name} {kwargs}\n{err}", flush=True)

    print("\n=== summary ===")
    for name in sorted(counts):
        nf = len(fails.get(name, []))
        print(f"{name}: {counts[name]} cases, {nf} failures")
    if fails:
        print("\nPin these as @example(...) next to the fix:")
        for name, cases in fails.items():
            for kwargs, _ in cases[:5]:
                print(f"  {name}: @example(**{kwargs})")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
