"""Registry-enumerated differential sweep of the full operator catalog
(reference test strategy: ``tests/test_numpyops.py:1-320`` sweeps every
numpy-backed op; SURVEY.md §5).

The parametrization is driven by the REGISTRIES themselves — ``vars()`` of
the unary/binary/monoid/agg/indexunary namespaces and the semiring name
list, snapshotted at import (before any test registers extension ops) —
so adding a catalog entry without an oracle FAILS the suite instead of
silently shipping untested.  Oracles are NumPy / Python-stdlib
evaluations over fixed small domains chosen per op (positive-only for
log-family, |x|<1 for atanh, ints for bitwise, bools for logical,
complex128 for the c-ops).
"""

from __future__ import annotations

import cmath
import functools
import math
from types import SimpleNamespace

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from graph_python_spark.functions.ops import (
    Monoid,
    ParameterizedOp,
    PositionalAgg,
    agg as agg_ns,
    binary,
    indexunary,
    monoid,
    unary,
)
from graph_python_spark.functions.semiring import semiring
from graph_python_spark.operators.matrix import MatrixFrame


def _entries(ns) -> dict:
    """All ops registered on a namespace (child namespaces from dotted
    extension registrations are themselves swept by test_extensions;
    ParameterizedOp entries get their own registry-driven sweep below)."""
    return {k: v for k, v in vars(ns).items()
            if not k.startswith("_")
            and not isinstance(v, (SimpleNamespace, ParameterizedOp))}


# snapshot at import: collection happens before any test registers
# extension ops, so runtime register() calls don't leak into the sweep
UNARY_NAMES = frozenset(_entries(unary))
BINARY_NAMES = frozenset(_entries(binary))
MONOID_NAMES = frozenset(_entries(monoid))
AGG_NAMES = frozenset(_entries(agg_ns))
INDEXUNARY_NAMES = frozenset(_entries(indexunary))
SEMIRING_NAMES = frozenset(semiring.names())


# ---------------------------------------------------------------------------
# input domains (no 0 in the division domains, no .5 ties for round,
# |x|<1 for atanh, >=1 for acosh)
# ---------------------------------------------------------------------------
D_FLOAT = [-2.75, -1.2, -0.4, 0.25, 1.8, 3.0]
D_POS = [0.25, 0.5, 1.0, 2.5, 7.5]
D_UNIT = [-0.9, -0.45, 0.0, 0.45, 0.9]
D_GE1 = [1.0, 1.5, 2.5, 10.0]
D_SPECIAL = [float("inf"), float("-inf"), float("nan"), 1.0, -2.5]
D_INT = [-7, -1, 0, 1, 5, 255, 1023]
D_BOOL = [True, False]
D_CPLX = [1 + 2j, -0.5 + 0.25j, 3 - 1j, -2 - 2j, 0.75 + 0j]

U = "unary"


def _clx(got):
    if isinstance(got, Row):
        return complex(got["re"], got["im"])
    return got


def _close(got, want) -> bool:
    got = _clx(got)
    if isinstance(want, complex):
        return isinstance(got, complex) and cmath.isclose(
            got, want, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(want, (bool, np.bool_)):
        return got == bool(want)
    w = float(want)
    if math.isnan(w):
        return got is not None and math.isnan(float(got))
    return got is not None and math.isclose(float(got), w,
                                            rel_tol=1e-9, abs_tol=1e-12)


def _eval_columns(spark, rows: list[tuple], row_schema: str,
                  exprs: list) -> list[list]:
    """One job per call: every expr evaluated over every row, results
    returned column-major in input row order."""
    df = spark.createDataFrame(
        [(k,) + r for k, r in enumerate(rows)], "idx long, " + row_schema)
    out = df.select("idx", *[e.alias(f"r{k}") for k, e in enumerate(exprs)]
                    ).orderBy("idx").collect()
    return [[row[f"r{k}"] for row in out] for k in range(len(exprs))]


# ---------------------------------------------------------------------------
# UnaryOp sweep
# ---------------------------------------------------------------------------
UNARY_ORACLE = {
    # name: (domain-key, python/numpy oracle over one float/int/bool/complex)
    "identity": ("float", lambda x: x),
    "ainv": ("float", lambda x: -x),
    "minv": ("float", lambda x: 1.0 / x),
    "abs": ("float", abs),
    "one": ("float", lambda x: 1),
    "sqrt": ("pos", math.sqrt),
    "log": ("pos", math.log),
    "log2": ("pos", math.log2),
    "log10": ("pos", math.log10),
    "log1p": ("pos", math.log1p),
    "exp": ("float", math.exp),
    "exp2": ("float", lambda x: 2.0 ** x),
    "expm1": ("float", math.expm1),
    "sin": ("float", math.sin),
    "cos": ("float", math.cos),
    "tan": ("float", math.tan),
    "asin": ("unit", math.asin),
    "acos": ("unit", math.acos),
    "atan": ("float", math.atan),
    "sinh": ("float", math.sinh),
    "cosh": ("float", math.cosh),
    "tanh": ("float", math.tanh),
    "asinh": ("float", math.asinh),
    "acosh": ("ge1", math.acosh),
    "atanh": ("unit", math.atanh),
    "signum": ("float", lambda x: math.copysign(1.0, x) if x != 0 else 0.0),
    "ceil": ("float", math.ceil),
    "floor": ("float", math.floor),
    "round": ("float", round),            # domain has no .5 ties
    "trunc": ("float", math.trunc),
    "cbrt": ("float", lambda x: math.copysign(abs(x) ** (1 / 3), x)),
    "isinf": ("special", math.isinf),
    "isnan": ("special", math.isnan),
    "isfinite": ("special", math.isfinite),
    "erf": ("float", math.erf),
    "erfc": ("float", math.erfc),
    "lgamma": ("pos", math.lgamma),
    "tgamma": ("pos", math.gamma),
    "frexpx": ("float", lambda x: math.frexp(x)[0]),
    "frexpe": ("float", lambda x: math.frexp(x)[1]),
    "lnot": ("bool", lambda x: not x),
    "bnot": ("int", lambda x: ~x),
    # complex catalog (FC64 struct<re,im>)
    "conj": ("cplx", lambda z: z.conjugate()),
    "creal": ("cplx", lambda z: z.real),
    "cimag": ("cplx", lambda z: z.imag),
    "carg": ("cplx", cmath.phase),
    "cabs": ("cplx", abs),
    "cainv": ("cplx", lambda z: -z),
    "cminv": ("cplx", lambda z: 1.0 / z),
    "cone": ("cplx", lambda z: 1 + 0j),
}

_DOMAIN_ROWS = {
    "float": ([(x,) for x in D_FLOAT], "x double"),
    "pos": ([(x,) for x in D_POS], "x double"),
    "unit": ([(x,) for x in D_UNIT], "x double"),
    "ge1": ([(x,) for x in D_GE1], "x double"),
    "special": ([(x,) for x in D_SPECIAL], "x double"),
    "int": ([(x,) for x in D_INT], "x long"),
    "bool": ([(x,) for x in D_BOOL], "x boolean"),
    "cplx": ([((z.real, z.imag),) for z in D_CPLX],
             "x struct<re: double, im: double>"),
}


def test_unary_registry_fully_covered():
    missing = UNARY_NAMES - set(UNARY_ORACLE)
    assert not missing, f"unary ops without a sweep oracle: {sorted(missing)}"
    stale = set(UNARY_ORACLE) - UNARY_NAMES
    assert not stale, f"sweep oracles for unregistered unary ops: {sorted(stale)}"


@pytest.mark.parametrize("domain", sorted({d for d, _ in UNARY_ORACLE.values()}))
def test_unary_sweep(spark, domain):
    names = [n for n in sorted(UNARY_ORACLE) if UNARY_ORACLE[n][0] == domain]
    rows, schema = _DOMAIN_ROWS[domain]
    cols = _eval_columns(spark, rows, schema,
                         [getattr(unary, n)(F.col("x")) for n in names])
    inputs = D_CPLX if domain == "cplx" else [r[0] for r in rows]
    for name, got_col in zip(names, cols):
        oracle = UNARY_ORACLE[name][1]
        for x, got in zip(inputs, got_col):
            assert _close(got, oracle(x)), (name, x, got, oracle(x))


# ---------------------------------------------------------------------------
# BinaryOp sweep
# ---------------------------------------------------------------------------
def _pairs(xs, ys):
    return [(a, b) for a in xs for b in ys]


_B_A = [-2.75, -1.2, 0.25, 3.0]
_B_B = [-1.8, -0.4, 0.5, 2.25]
_BITIDX = [0, 1, 5, 20]
_SHIFTS = [-3, -1, 0, 2, 5]
_I_SMALL = [-7, -1, 0, 1, 5, 255]

BINARY_ORACLE = {
    "first": ("ff", lambda a, b: a),
    "second": ("ff", lambda a, b: b),
    "pair": ("ff", lambda a, b: 1),
    "oneb": ("ff", lambda a, b: 1),
    "any": ("ff", lambda a, b: a),  # documented: returns an operand (ours: first)
    "plus": ("ff", lambda a, b: a + b),
    "minus": ("ff", lambda a, b: a - b),
    "rminus": ("ff", lambda a, b: b - a),
    "times": ("ff", lambda a, b: a * b),
    "truediv": ("ff", lambda a, b: a / b),
    "div": ("ff", lambda a, b: a / b),
    "rdiv": ("ff", lambda a, b: b / a),
    "min": ("ff", min),
    "max": ("ff", max),
    "pow": ("pf", lambda a, b: a ** b),
    "fmod": ("ff", math.fmod),
    "remainder": ("ff", math.fmod),   # engine-defined as Java % (fmod sign rule)
    "atan2": ("ff", math.atan2),
    "hypot": ("ff", math.hypot),
    "copysign": ("ff", math.copysign),
    "ldexp": ("fi", lambda a, b: a * 2.0 ** b),
    "eq": ("ff", lambda a, b: a == b),
    "ne": ("ff", lambda a, b: a != b),
    "gt": ("ff", lambda a, b: a > b),
    "lt": ("ff", lambda a, b: a < b),
    "ge": ("ff", lambda a, b: a >= b),
    "le": ("ff", lambda a, b: a <= b),
    "iseq": ("ff", lambda a, b: int(a == b)),
    "isne": ("ff", lambda a, b: int(a != b)),
    "isgt": ("ff", lambda a, b: int(a > b)),
    "islt": ("ff", lambda a, b: int(a < b)),
    "isge": ("ff", lambda a, b: int(a >= b)),
    "isle": ("ff", lambda a, b: int(a <= b)),
    "lor": ("bb", lambda a, b: a or b),
    "land": ("bb", lambda a, b: a and b),
    "lxor": ("bb", lambda a, b: a != b),
    "lxnor": ("bb", lambda a, b: a == b),
    "bor": ("ii", lambda a, b: a | b),
    "band": ("ii", lambda a, b: a & b),
    "bxor": ("ii", lambda a, b: a ^ b),
    "bxnor": ("ii", lambda a, b: ~(a ^ b)),
    "bget": ("ib", lambda a, b: (a >> b) & 1),
    "bset": ("ib", lambda a, b: a | (1 << b)),
    "bclr": ("ib", lambda a, b: a & ~(1 << b)),
    "bshift": ("is", lambda a, b: (a << b) if b >= 0 else (a >> -b)),
    "cmplx": ("ri", complex),
    "cplus": ("cc", lambda a, b: a + b),
    "cminus": ("cc", lambda a, b: a - b),
    "ctimes": ("cc", lambda a, b: a * b),
    "cdiv": ("cc", lambda a, b: a / b),
    "ceq": ("cc", lambda a, b: a == b),
    "cfirst": ("cc", lambda a, b: a),
    "csecond": ("cc", lambda a, b: b),
    # FC32 storage-preserving twins: float32-exact input grids so the
    # float struct round-trip stays inside the 1e-9 sweep tolerance
    "cplus_fc32": ("c32", lambda a, b: a + b),
    "cmplx32": ("ri32", complex),
}

_B_DOMAIN_ROWS = {
    "ff": ([(a, b) for a, b in _pairs(_B_A, _B_B)], "a double, b double"),
    "pf": ([(a, b) for a, b in _pairs(D_POS, _B_B)], "a double, b double"),
    "fi": ([(a, float(b)) for a, b in _pairs(_B_A, [-2, 0, 3])],
           "a double, b double"),
    "ii": ([(a, b) for a, b in _pairs(_I_SMALL, _I_SMALL)], "a long, b long"),
    "ib": ([(a, b) for a, b in _pairs(_I_SMALL, _BITIDX)], "a long, b long"),
    "is": ([(a, b) for a, b in _pairs(_I_SMALL, _SHIFTS)], "a long, b long"),
    "bb": ([(a, b) for a, b in _pairs(D_BOOL, D_BOOL)],
           "a boolean, b boolean"),
    "ri": ([(a, b) for a, b in _pairs(_B_A, _B_B)], "a double, b double"),
    "cc": ([((a.real, a.imag), (b.real, b.imag))
            for a, b in _pairs(D_CPLX, D_CPLX[:3])],
           "a struct<re: double, im: double>, b struct<re: double, im: double>"),
    "c32": ([((a.real, a.imag), (b.real, b.imag))
             for a, b in _pairs(D_CPLX, D_CPLX[:3])],
            "a struct<re: float, im: float>, b struct<re: float, im: float>"),
    "ri32": ([(a, b) for a, b in _pairs([-2.75, 0.25, 1.5, 3.0],
                                        [0.5, -0.25, 2.0])],
             "a double, b double"),
}


def test_binary_registry_fully_covered():
    missing = BINARY_NAMES - set(BINARY_ORACLE)
    assert not missing, f"binary ops without a sweep oracle: {sorted(missing)}"
    stale = set(BINARY_ORACLE) - BINARY_NAMES
    assert not stale, f"sweep oracles for unregistered binary ops: {sorted(stale)}"


@pytest.mark.parametrize("domain", sorted({d for d, _ in BINARY_ORACLE.values()}))
def test_binary_sweep(spark, domain):
    names = [n for n in sorted(BINARY_ORACLE) if BINARY_ORACLE[n][0] == domain]
    rows, schema = _B_DOMAIN_ROWS[domain]
    cols = _eval_columns(spark, rows, schema,
                         [getattr(binary, n)(F.col("a"), F.col("b"))
                          for n in names])
    if domain in ("cc", "c32"):
        inputs = [(a, b) for a, b in _pairs(D_CPLX, D_CPLX[:3])]
    else:
        inputs = rows
    for name, got_col in zip(names, cols):
        oracle = BINARY_ORACLE[name][1]
        for (a, b), got in zip(inputs, got_col):
            assert _close(got, oracle(a, b)), (name, a, b, got, oracle(a, b))


# ---------------------------------------------------------------------------
# Monoid sweep: full reduction + identity law
# ---------------------------------------------------------------------------
_M_FLOAT = [2.0, -1.5, 0.5, 3.25]
_M_BOOLS = [[True], [False], [True, False, True], [False, False],
            [True, True, False, False, True]]
_M_INTS = [5, 12, 7, 1023, -8]


def _xnor_fold(xs):
    return functools.reduce(lambda a, b: a == b, xs)


MONOID_ORACLE = {
    "plus": ("double", [_M_FLOAT], sum),
    "times": ("double", [_M_FLOAT, [2.0, 0.0, 3.0]], math.prod),
    "min": ("double", [_M_FLOAT], min),
    "max": ("double", [_M_FLOAT], max),
    "any": ("double", [_M_FLOAT], None),  # nondeterministic: membership check
    "lor": ("boolean", _M_BOOLS, any),
    "land": ("boolean", _M_BOOLS, all),
    "lxor": ("boolean", _M_BOOLS,
             lambda xs: functools.reduce(lambda a, b: a != b, xs)),
    "lxnor": ("boolean", _M_BOOLS, _xnor_fold),
    "eq": ("boolean", _M_BOOLS, _xnor_fold),
    "bor": ("long", [_M_INTS], lambda xs: functools.reduce(lambda a, b: a | b, xs)),
    "band": ("long", [_M_INTS], lambda xs: functools.reduce(lambda a, b: a & b, xs)),
    "bxor": ("long", [_M_INTS], lambda xs: functools.reduce(lambda a, b: a ^ b, xs)),
    "cplus": ("struct<re: double, im: double>", [D_CPLX], sum),
    "cplus_fc32": ("struct<re: float, im: float>", [D_CPLX], sum),
}


def test_monoid_registry_fully_covered():
    missing = MONOID_NAMES - set(MONOID_ORACLE)
    assert not missing, f"monoids without a sweep oracle: {sorted(missing)}"
    stale = set(MONOID_ORACLE) - MONOID_NAMES
    assert not stale, f"sweep oracles for unregistered monoids: {sorted(stale)}"


@pytest.mark.parametrize("name", sorted(MONOID_ORACLE))
def test_monoid_reduction(spark, name):
    schema, value_lists, oracle = MONOID_ORACLE[name]
    m = getattr(monoid, name)
    assert isinstance(m, Monoid)
    for values in value_lists:
        if schema.startswith("struct"):
            rows = [((z.real, z.imag),) for z in values]
        else:
            rows = [(v,) for v in values]
        df = spark.createDataFrame(rows, f"x {schema}")
        got = df.agg(m.agg(F.col("x")).alias("r")).collect()[0]["r"]
        if oracle is None:          # monoid.any: SOME input value
            assert got in values, (name, values, got)
        else:
            assert _close(got, oracle(values)), (name, values, got, oracle(values))


@pytest.mark.parametrize("name", sorted(MONOID_ORACLE))
def test_monoid_identity_law(spark, name):
    """identity ⊕ x == x through the pairwise form (ewise_add/accum path)."""
    m = getattr(monoid, name)
    if m.identity is None:
        pytest.skip("no identity (min/max/any use absent-as-identity)")
    schema, value_lists, _ = MONOID_ORACLE[name]
    values = value_lists[0]
    if schema.startswith("struct"):
        ident = F.struct(F.lit(float(m.identity[0])).alias("re"),
                         F.lit(float(m.identity[1])).alias("im"))
        rows = [((z.real, z.imag),) for z in values]
    else:
        ident = F.lit(m.identity)
        rows = [(v,) for v in values]
    df = spark.createDataFrame(rows, f"x {schema}")
    got = [r["r"] for r in df.select(m.pairwise(ident, F.col("x")).alias("r"))
           .collect()]
    for x, g in zip(values, got):
        assert _close(g, x), (name, x, g)


# ---------------------------------------------------------------------------
# Aggregator sweep
# ---------------------------------------------------------------------------
_A_FLOAT = [2.0, -1.5, 0.0, 0.5, 3.25, -1.5]
_A_POS = [0.25, 0.5, 2.0, 7.5]

AGG_ORACLE = {
    "sum": ("f", sum),
    "prod": ("f", math.prod),
    "all": ("b", all),
    "any": ("b", any),
    "min": ("f", min),
    "max": ("f", max),
    "any_value": ("f", None),  # membership
    "count": ("f", len),
    "count_nonzero": ("f", lambda xs: sum(1 for x in xs if x != 0)),
    "count_zero": ("f", lambda xs: sum(1 for x in xs if x == 0)),
    "sum_of_squares": ("f", lambda xs: sum(x * x for x in xs)),
    "sum_of_inverses": ("p", lambda xs: sum(1.0 / x for x in xs)),
    "exists": ("f", lambda xs: 1),
    "mean": ("f", lambda xs: sum(xs) / len(xs)),
    "peak_to_peak": ("f", lambda xs: max(xs) - min(xs)),
    "varp": ("f", lambda xs: float(np.var(xs))),
    "vars": ("f", lambda xs: float(np.var(xs, ddof=1))),
    "stdp": ("f", lambda xs: float(np.std(xs))),
    "stds": ("f", lambda xs: float(np.std(xs, ddof=1))),
    "geometric_mean": ("p", lambda xs: float(np.exp(np.mean(np.log(xs))))),
    "harmonic_mean": ("p", lambda xs: len(xs) / sum(1.0 / x for x in xs)),
    "root_mean_square": ("f", lambda xs: math.sqrt(sum(x * x for x in xs) / len(xs))),
    "hypot": ("f", lambda xs: math.sqrt(sum(x * x for x in xs))),
    "logaddexp": ("f", lambda xs: math.log(sum(math.exp(x) for x in xs))),
    "logaddexp2": ("f", lambda xs: math.log2(sum(2.0 ** x for x in xs))),
    "L0_norm": ("f", lambda xs: sum(1 for x in xs if x != 0)),
    "L1_norm": ("f", lambda xs: sum(abs(x) for x in xs)),
    "L2_norm": ("f", lambda xs: math.sqrt(sum(x * x for x in xs))),
    "Linf_norm": ("f", lambda xs: max(abs(x) for x in xs)),
    # positional: value/index at the smallest/largest stored index
    "first": ("pos", lambda pairs: min(pairs)[1]),
    "last": ("pos", lambda pairs: max(pairs)[1]),
    "first_index": ("pos", lambda pairs: min(pairs)[0]),
    "last_index": ("pos", lambda pairs: max(pairs)[0]),
}


def test_agg_registry_fully_covered():
    missing = AGG_NAMES - set(AGG_ORACLE)
    assert not missing, f"aggregators without a sweep oracle: {sorted(missing)}"
    stale = set(AGG_ORACLE) - AGG_NAMES
    assert not stale, f"sweep oracles for unregistered aggregators: {sorted(stale)}"


@pytest.mark.parametrize("name", sorted(AGG_ORACLE))
def test_agg_sweep(spark, name):
    dom, oracle = AGG_ORACLE[name]
    a = getattr(agg_ns, name)
    if dom == "pos":
        assert isinstance(a, PositionalAgg)
        pairs = [(3, 10.5), (7, -2.0), (1, 4.25), (9, 0.5)]
        df = spark.createDataFrame([(i, v) for i, v in pairs],
                                   "idx long, x double")
        got = df.agg(a.build(F.col("x"), F.col("idx")).alias("r")
                     ).collect()[0]["r"]
        assert _close(got, oracle(pairs)), (name, got, oracle(pairs))
        with pytest.raises(TypeError):
            a(F.col("x"))
        return
    if dom == "b":
        for values in _M_BOOLS:
            df = spark.createDataFrame([(v,) for v in values], "x boolean")
            got = df.agg(a(F.col("x")).alias("r")).collect()[0]["r"]
            assert _close(got, oracle(values)), (name, values, got)
        return
    values = _A_POS if dom == "p" else _A_FLOAT
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.agg(a(F.col("x")).alias("r")).collect()[0]["r"]
    if oracle is None:
        assert got in values
    else:
        assert _close(got, oracle(values)), (name, values, got, oracle(values))


# ---------------------------------------------------------------------------
# IndexUnaryOp sweep over a COO fixture
# ---------------------------------------------------------------------------
_COO = [(0, 0, 5.0), (0, 3, -2.0), (1, 1, 0.0), (2, 0, 7.5),
        (2, 4, -2.0), (4, 2, 1.25), (5, 5, 5.0), (3, 6, -0.5)]

INDEXUNARY_ORACLE = {
    "rowindex": lambda v, i, j, t: i + t,
    "colindex": lambda v, i, j, t: j + t,
    "diagindex": lambda v, i, j, t: j - (i + t),
    "tril": lambda v, i, j, t: j <= i + t,
    "triu": lambda v, i, j, t: j >= i + t,
    "diag": lambda v, i, j, t: j == i + t,
    "offdiag": lambda v, i, j, t: j != i + t,
    "colle": lambda v, i, j, t: j <= t,
    "colgt": lambda v, i, j, t: j > t,
    "rowle": lambda v, i, j, t: i <= t,
    "rowgt": lambda v, i, j, t: i > t,
    "valueeq": lambda v, i, j, t: v == t,
    "valuene": lambda v, i, j, t: v != t,
    "valuegt": lambda v, i, j, t: v > t,
    "valuege": lambda v, i, j, t: v >= t,
    "valuelt": lambda v, i, j, t: v < t,
    "valuele": lambda v, i, j, t: v <= t,
    "positioni": lambda v, i, j, t: i + t,
    "positioni1": lambda v, i, j, t: i + t + 1,
    "positionj": lambda v, i, j, t: j + t,
    "positionj1": lambda v, i, j, t: j + t + 1,
}


def test_indexunary_registry_fully_covered():
    missing = INDEXUNARY_NAMES - set(INDEXUNARY_ORACLE)
    assert not missing, f"indexunary ops without a sweep oracle: {sorted(missing)}"
    stale = set(INDEXUNARY_ORACLE) - INDEXUNARY_NAMES
    assert not stale, f"oracles for unregistered indexunary ops: {sorted(stale)}"


@pytest.mark.parametrize("thunk", [0, 2, -1])
def test_indexunary_sweep(spark, thunk):
    names = sorted(INDEXUNARY_ORACLE)
    cols = _eval_columns(
        spark, _COO, "i long, j long, v double",
        [getattr(indexunary, n)(F.col("v"), F.col("i"), F.col("j"), thunk)
         for n in names])
    for name, got_col in zip(names, cols):
        oracle = INDEXUNARY_ORACLE[name]
        for (i, j, v), got in zip(_COO, got_col):
            want = oracle(v, i, j, thunk)
            assert _close(got, want), (name, (i, j, v), thunk, got, want)


# ---------------------------------------------------------------------------
# Semiring sweep: every registered (⊕, ⊗) pair through mxm vs a pure-Python
# sparse oracle, parsed from the registry's own naming convention
# ---------------------------------------------------------------------------
_SR_ADD = {
    "plus": sum,
    "min": min,
    "max": max,
    "times": math.prod,
    "lor": any,
    "land": all,
    "lxor": lambda xs: functools.reduce(lambda a, b: a != b, xs),
    "any": None,  # membership check
}
_SR_MUL = {
    "times": lambda a, b: a * b,
    "plus": lambda a, b: a + b,
    "first": lambda a, b: a,
    "second": lambda a, b: b,
    "pair": lambda a, b: 1,
    "min": min,
    "max": max,
    "land": lambda a, b: a and b,
    "lor": lambda a, b: a or b,
}


def _py_mxm(acoo: dict, bcoo: dict, mul) -> dict:
    groups: dict = {}
    bby_k: dict = {}
    for (k, j), bv in bcoo.items():
        bby_k.setdefault(k, []).append((j, bv))
    for (i, k), av in acoo.items():
        for j, bv in bby_k.get(k, []):
            groups.setdefault((i, j), []).append(mul(av, bv))
    return groups


def _rand_coo(seed: int, n: int = 6, fill: float = 0.45, boolean: bool = False):
    import random

    rng = random.Random(seed)
    out = {}
    for i in range(n):
        for j in range(n):
            if rng.random() < fill:
                out[(i, j)] = (rng.random() < 0.7) if boolean \
                    else float(rng.randint(1, 5))
    return out


def test_semiring_registry_fully_covered():
    unparsed = []
    for name in SEMIRING_NAMES:
        base = name[:-5] if name.endswith(("_fc64", "_fc32")) else name
        addn, muln = base.split("_", 1)
        if addn not in _SR_ADD or muln not in _SR_MUL:
            unparsed.append(name)
    assert not unparsed, f"semirings the sweep can't oracle: {unparsed}"


@pytest.mark.parametrize("name", sorted(SEMIRING_NAMES))
def test_semiring_mxm_sweep(spark, name):
    if name.endswith(("_fc64", "_fc32")):
        # complex semiring: dense complex128 matmul oracle (the fc32
        # variant runs the same algebra with float-width component sums,
        # so its tolerance is complex64-level)
        from tests.test_complex import _cmat, _dense, _to_dict, rand_cells

        rel = 1e-4 if name.endswith("_fc32") else 1e-9
        ca, cb = rand_cells(seed=19), rand_cells(seed=23)
        got = _to_dict(_cmat(spark, ca).mxm(_cmat(spark, cb), semiring[name]))
        want_dense = _dense(ca) @ _dense(cb)
        # structural zeros: only (i,j) with at least one matching k pair
        want = {k: sum(vs) for k, vs in _py_mxm(ca, cb, lambda a, b: a * b).items()}
        for key, z in want.items():
            assert cmath.isclose(got[key], z, rel_tol=rel, abs_tol=1e-4 if rel > 1e-9 else 1e-12)
            assert cmath.isclose(z, want_dense[key], rel_tol=1e-9, abs_tol=1e-9)
        assert set(got) == set(want)
        return
    addn, muln = name.split("_", 1)
    boolean = any(p in ("lor", "land", "lxor") for p in (addn, muln))
    acoo = _rand_coo(seed=7, boolean=boolean)
    bcoo = _rand_coo(seed=13, boolean=boolean)
    dtype = "boolean" if boolean else "double"
    A = MatrixFrame.from_coo(spark, [i for i, _ in acoo], [j for _, j in acoo],
                             list(acoo.values()), 6, 6, dtype=dtype)
    B = MatrixFrame.from_coo(spark, [i for i, _ in bcoo], [j for _, j in bcoo],
                             list(bcoo.values()), 6, 6, dtype=dtype)
    got = {(i, j): v for i, j, v in zip(*A.mxm(B, semiring[name]).to_coo())}
    groups = _py_mxm(acoo, bcoo, _SR_MUL[muln])
    assert set(got) == set(groups), name
    add = _SR_ADD[addn]
    for key, parts in groups.items():
        if add is None:          # any_*: one of the products
            assert got[key] in parts, (name, key, got[key], parts)
        else:
            assert _close(got[key], add(parts)), (name, key, got[key], add(parts))


# ---------------------------------------------------------------------------
# ParameterizedOp sweep: every ParameterizedOp found on the namespaces is
# exercised at each of its declared sample parameterizations, and — when it
# carries an ndarray factory — differentialed against that numpy path
# (reference ParameterizedUnaryOp/BinaryOp, core/operator/unary.py:178-260).
# Registry-driven: registering a new parameterized op makes it appear here
# with no test edit.
# ---------------------------------------------------------------------------
PARAMETERIZED_OPS = {
    f"{ns_name}.{name}": op
    for ns_name, ns in (("unary", unary), ("binary", binary))
    for name, op in vars(ns).items()
    if isinstance(op, ParameterizedOp)
}


def test_parameterized_registry_contains_isclose():
    # the builtin reference parity op must be present and carry samples
    assert "binary.isclose" in PARAMETERIZED_OPS
    assert PARAMETERIZED_OPS["binary.isclose"].samples


@pytest.mark.parametrize("key", sorted(PARAMETERIZED_OPS))
def test_parameterized_sweep(spark, key):
    op = PARAMETERIZED_OPS[key]
    assert op.samples, f"{key}: parameterized op registered without samples"
    if op.arity == 2:
        rows, schema = _B_DOMAIN_ROWS["ff"]
        args = (F.col("a"), F.col("b"))
    else:
        rows, schema = _DOMAIN_ROWS["float"]
        args = (F.col("x"),)
    for sample in op.samples:
        concrete = op(*sample)
        (got,) = _eval_columns(spark, rows, schema, [concrete(*args)])
        if op.np_factory is None:
            continue                      # instantiation/execution only
        kernel = op.np_factory(*sample)
        cols = [np.array([r[k] for r in rows]) for k in range(len(rows[0]))]
        want = kernel(*cols)
        for inp, g, w in zip(rows, got, want):
            assert _close(g, w), (key, sample, inp, g, w)


def test_numpy_alias_namespaces(spark):
    """unary.numpy.* / binary.numpy.* (reference graphblas/unary/numpy.py
    and binary/numpy.py mapnumpy path): mapped names ARE the builtin
    Column builders; the numpy-only ufuncs agree with numpy on a value
    grid.  Names the reference excludes for semantic drift (remainder,
    fmod, left/right_shift, gcd, nextafter, spacing) are absent here too."""
    import numpy as np
    from pyspark.sql import functions as F

    from graph_python_spark.functions.ops import binary as B
    from graph_python_spark.functions.ops import unary as U

    # identity of mapped aliases
    assert U.numpy.arcsin is U.asin and U.numpy.negative is U.ainv
    assert U.numpy.invert is U.bnot and U.numpy.conjugate is U.conj
    assert B.numpy.add is B.plus and B.numpy.true_divide is B.truediv
    assert B.numpy.arctan2 is B.atan2
    # exclusions are parity with the reference, not gaps
    for absent in ("remainder", "mod", "fmod", "left_shift", "gcd",
                   "nextafter"):
        assert absent not in B.numpy and absent not in U.numpy
    assert "reciprocal" not in U.numpy  # reference mapnumpy excludes it too

    # no -0.0 row: Spark normalizes signed zeros on ingestion, so the
    # engine never observes one (signbit documents this)
    xs = [-2.5, -1.0, 0.0, 0.5, 3.25]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    checks = {
        "square": np.square, "sign": np.sign,
        "deg2rad": np.deg2rad, "rad2deg": np.rad2deg,
        "signbit": np.signbit,
    }
    for name, ufunc in checks.items():
        got = [r[0] for r in
               df.select(U.numpy[name](F.col("x"))).collect()]
        want = [ufunc(np.float64(x)) for x in xs]
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-12), (name, g, w)

    nan, inf = float("nan"), float("inf")
    pairs = [(1.0, 3.0), (-7.0, 2.0), (2.5, -1.5), (10.0, 0.5)]
    pdf = spark.createDataFrame(pairs, "a double, b double")
    bchecks = {
        "floor_divide": np.floor_divide, "float_power": np.float_power,
        "logaddexp": np.logaddexp, "logaddexp2": np.logaddexp2,
    }
    # numpy NaN contract (maximum/minimum propagate, fmax/fmin ignore)
    # and the equal-infinity short-circuit of logaddexp(2)
    npairs = [(nan, 2.0), (2.0, nan), (nan, nan), (1.0, 2.0),
              (-inf, -inf), (inf, inf), (-inf, 3.0)]
    ndf = spark.createDataFrame(npairs, "a double, b double")
    for name in ("maximum", "minimum", "fmax", "fmin",
                 "logaddexp", "logaddexp2"):
        ufunc = getattr(np, name)
        got = [r[0] for r in
               ndf.select(B.numpy[name](F.col("a"), F.col("b"))).collect()]
        for (a, b), g in zip(npairs, got):
            w = float(ufunc(a, b))
            same = (math.isnan(g) and math.isnan(w)) or g == pytest.approx(w)
            assert same, (name, a, b, g, w)
    for name, ufunc in bchecks.items():
        got = [r[0] for r in
               pdf.select(B.numpy[name](F.col("a"), F.col("b"))).collect()]
        want = [float(ufunc(a, b)) for a, b in pairs]
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-9), (name, g, w)


def test_numpy_monoid_and_semiring_namespaces(spark):
    """monoid.numpy.* / semiring.numpy.* (reference graphblas/monoid/
    numpy.py and semiring/numpy.py): mapped monoid names ARE the builtin
    Monoid objects; hypot/logaddexp(2) are real monoids whose single-agg
    closed forms match numpy's pairwise folds; the semiring cross product
    resolves on demand without touching the builtin registry."""
    import numpy as np
    from pyspark.sql import functions as F

    from graph_python_spark.functions.ops import monoid as M
    from graph_python_spark.functions.semiring import semiring as S
    from graph_python_spark.operators.matrix import MatrixFrame

    assert M.numpy.add is M.plus and M.numpy.maximum is M.max
    assert M.numpy.fmin is M.min  # Spark MIN ignores NaN = np.fmin fold
    assert M.numpy.logical_xor is M.lxor and M.numpy.bitwise_and is M.band
    for absent in ("gcd", "lcm"):
        assert absent not in M.numpy  # numba-only in the reference

    vals = [2.0, -1.5, 0.5, 3.25]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_h = df.agg(M.numpy.hypot.agg(F.col("x")).alias("r")).collect()[0]["r"]
    want_h = functools.reduce(np.hypot, vals)
    assert got_h == pytest.approx(float(want_h), rel=1e-12)
    got_l = df.agg(M.numpy.logaddexp.agg(F.col("x")).alias("r")).collect()[0]["r"]
    want_l = functools.reduce(np.logaddexp, vals)
    assert got_l == pytest.approx(float(want_l), rel=1e-12)
    got_l2 = df.agg(M.numpy.logaddexp2.agg(F.col("x")).alias("r")).collect()[0]["r"]
    want_l2 = functools.reduce(np.logaddexp2, vals)
    assert got_l2 == pytest.approx(float(want_l2), rel=1e-12)

    # NaN folds: minimum propagates, fmax ignores (numpy reduce contract)
    ndf = spark.createDataFrame([(2.0,), (float("nan"),), (5.0,)], "x double")
    got_min = ndf.agg(M.numpy.minimum.agg(F.col("x")).alias("r")).collect()[0]["r"]
    assert math.isnan(got_min)          # np.minimum.reduce -> nan
    got_fmax = ndf.agg(M.numpy.fmax.agg(F.col("x")).alias("r")).collect()[0]["r"]
    assert got_fmax == 5.0              # np.fmax.reduce ignores nan

    # semiring resolution: add_multiply == plus_times on an mxm; the
    # resolver caches and never registers
    sr = S.numpy.add_multiply
    assert sr is S.numpy.add_multiply          # cached
    assert "numpy.add_multiply" not in S.names()
    acoo = _rand_coo(seed=3)
    bcoo = _rand_coo(seed=5)
    A = MatrixFrame.from_coo(spark, [i for i, _ in acoo], [j for _, j in acoo],
                             list(acoo.values()), 6, 6)
    B = MatrixFrame.from_coo(spark, [i for i, _ in bcoo], [j for _, j in bcoo],
                             list(bcoo.values()), 6, 6)
    got = {(i, j): v for i, j, v in zip(*A.mxm(B, sr).to_coo())}
    want = {(i, j): v for i, j, v in zip(*A.mxm(B, semiring["plus_times"]).to_coo())}
    assert got == want
    # multi-underscore parse: logical_or_logical_and == lor_land
    sr2 = S.numpy.logical_or_logical_and
    assert sr2.add is M.lor
    with pytest.raises(AttributeError):
        S.numpy.add_spacing
