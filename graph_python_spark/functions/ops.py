"""Operator taxonomy: unary / binary / monoid / index-unary / aggregator.

Mirrors the reference's op namespaces (python-graphblas populates
``graphblas.unary/binary/monoid/...`` by parsing the SuiteSparse symbol
table — ``core/operator/base.py:398-460``).  Here every op is a *Column
expression builder*: a callable ``(Column, ...) -> Column`` that stays
JVM-side (whole-stage codegen), never a Python UDF.

Reference op catalogs:
  * UnaryOp   regexes  ``graphblas/core/operator/unary.py:142-167``
  * BinaryOp  regexes  ``graphblas/core/operator/binary.py:332-368``
  * Monoid    regexes  ``graphblas/core/operator/monoid.py:183-194``
  * IndexUnaryOp       ``graphblas/core/operator/indexunary.py:95-115``
  * Aggregator catalog ``graphblas/agg/__init__.py:1-75``
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import Column
from pyspark.sql import functions as F


class _Namespace(SimpleNamespace):
    """Attribute namespace with dict-style lookup (``binary['plus']``)."""

    def __getitem__(self, name: str):
        try:
            return getattr(self, name)
        except AttributeError:
            raise KeyError(name) from None

    def __contains__(self, name: str) -> bool:
        return hasattr(self, name)

    def register(self, name: str, fn=None, *, np_fn=None,
                 dtype: str = "double", parameterized: bool = False,
                 arity: int = 1, samples=((),)):
        """User-defined op registration (reference ``UnaryOp.register_new`` /
        ``BinaryOp.register_new``, core/operator/unary.py:207-260 and
        binary.py:440-520).  Dotted names create nested namespaces, matching
        the reference's ``register_new("math.plus_one", ...)`` behavior.

        ``fn`` is a Column-expression builder ``(Column, ...) -> Column`` —
        the fast path, staying JVM-side in whole-stage codegen.  Supply
        ``np_fn`` instead (a numpy ufunc-like over ndarrays) to register a
        Python kernel; it is wrapped as an Arrow-batched pandas UDF
        returning ``dtype`` — the slow path, mirroring the reference's
        numba-jitted UDFs.

        ``parameterized=True`` registers a PARAMETERIZED op (reference
        ``ParameterizedUnaryOp``/``ParameterizedBinaryOp``,
        core/operator/unary.py:178-260): ``fn``/``np_fn`` is then a
        FACTORY taking the op's parameters and returning the concrete
        builder/kernel — ``ns.name(params...)`` instantiates the op.
        ``arity`` (operand count of the instantiated op) and ``samples``
        (example parameter tuples) are metadata the registry-driven
        opcatalog sweep uses to exercise the op automatically.
        """
        if fn is None and np_fn is None:
            raise ValueError("register needs fn (Column builder) or np_fn")
        if parameterized:
            fn = ParameterizedOp(fn, np_factory=np_fn, dtype=dtype,
                                 name=name, arity=arity, samples=samples)
        elif fn is None:
            fn = _np_kernel_op(np_fn, dtype)
        ns = self
        parts = name.split(".")
        for part in parts[:-1]:
            child = getattr(ns, part, None)
            if child is None:
                child = _Namespace()
                setattr(ns, part, child)
            ns = child
        setattr(ns, parts[-1], fn)
        return fn

    def register_anonymous(self, fn=None, *, np_fn=None,
                           dtype: str = "double",
                           parameterized: bool = False,
                           arity: int = 1, samples=((),)):
        """Unregistered op (reference ``register_anonymous``): returns the
        callable without binding a name."""
        if parameterized:
            if fn is None and np_fn is None:
                raise ValueError("register_anonymous needs fn or np_fn")
            return ParameterizedOp(fn, np_factory=np_fn, dtype=dtype,
                                   arity=arity, samples=samples)
        if fn is not None:
            return fn
        if np_fn is None:
            raise ValueError("register_anonymous needs fn or np_fn")
        return _np_kernel_op(np_fn, dtype)


class ParameterizedOp:
    """A parameterized operator (reference ``ParameterizedUnaryOp`` /
    ``ParameterizedBinaryOp``, core/operator/unary.py:178-260): holds a
    factory over the op's parameters; calling the registered object with
    parameters returns the concrete Column-expression builder::

        op = binary.isclose(rel_tol=1e-4)      # instantiate
        df.select(op(F.col("x"), F.col("y")))  # apply

    ``np_factory`` (parameters -> ndarray kernel) serves two roles: the
    execution path when no Column factory is given (wrapped as an
    Arrow-batched pandas UDF), and the differential oracle the
    registry-driven opcatalog sweep replays against the Spark path for
    every sample parameterization."""

    def __init__(self, factory=None, *, np_factory=None,
                 dtype: str = "double", name: str | None = None,
                 arity: int = 1, samples=((),)):
        if factory is None and np_factory is None:
            raise ValueError("ParameterizedOp needs factory or np_factory")
        self.factory = factory
        self.np_factory = np_factory
        self.dtype = dtype
        self.name = name
        self.arity = arity
        self.samples = tuple(tuple(s) for s in samples)

    def __call__(self, *args, **kwargs):
        if self.factory is not None:
            return self.factory(*args, **kwargs)
        return _np_kernel_op(self.np_factory(*args, **kwargs), self.dtype)

    def __repr__(self) -> str:  # pragma: no cover
        return f"ParameterizedOp({self.name or '<anonymous>'})"


def _np_kernel_op(np_fn, dtype: str):
    """Wrap an ndarray kernel as an Arrow-batched pandas UDF op builder.
    Deferred construction so registration needs no active SparkSession."""

    def _op(*cols):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        @pandas_udf(dtype, PandasUDFType.SCALAR)
        def _udf(*series):
            arrs = [s.to_numpy(dtype=np.float64, na_value=np.nan) for s in series]
            return pd.Series(np.asarray(np_fn(*arrs)))

        return _udf(*cols)

    return _op


# ---------------------------------------------------------------------------
# UnaryOp: value -> value   (reference: unary.py regexes; numpy aliases too)
# ---------------------------------------------------------------------------
unary = _Namespace(
    identity=lambda x: x,
    ainv=lambda x: -x,
    minv=lambda x: F.lit(1.0) / x,
    abs=F.abs,
    lnot=lambda x: ~x,
    bnot=F.bitwise_not,
    one=lambda x: F.lit(1),
    sqrt=F.sqrt,
    log=F.log,
    log2=F.log2,
    log10=F.log10,
    log1p=F.log1p,
    exp=F.exp,
    exp2=lambda x: F.pow(F.lit(2.0), x),
    expm1=F.expm1,
    sin=F.sin,
    cos=F.cos,
    tan=F.tan,
    asin=F.asin,
    acos=F.acos,
    atan=F.atan,
    sinh=F.sinh,
    cosh=F.cosh,
    tanh=F.tanh,
    asinh=F.asinh,
    acosh=F.acosh,
    atanh=F.atanh,
    signum=F.signum,
    ceil=F.ceil,
    floor=F.floor,
    round=F.round,
    trunc=lambda x: F.signum(x) * F.floor(F.abs(x)),
    cbrt=F.cbrt,
    isinf=lambda x: x.isin(float("inf"), float("-inf")),
    isnan=F.isnan,
    isfinite=lambda x: ~(F.isnan(x) | x.isin(float("inf"), float("-inf"))),
)


def _scalar_math_udf(fn_name: str):
    """Arrow-batched pandas UDF around a C-library scalar kernel from
    ``math`` — for the few transcendentals Spark SQL lacks (erf/erfc/
    lgamma/tgamma).  The reference delegates these to C ufuncs too
    (operator catalog unary.erf etc.); here the batch transfer is Arrow
    and the per-element call is the same C function, off the hot path
    (graph kernels never use them)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    kern = getattr(math, fn_name)

    def _safe(x):
        try:
            return kern(x)
        except ValueError:       # domain error (C ufunc NaN semantics)
            return float("nan")
        except OverflowError:    # range error (C ufunc saturates to inf)
            return float("inf")

    # np.frompyfunc dispatches the same exact C math kernel through
    # numpy's C ufunc loop (no Python-level index loop; math domain
    # errors land on NaN via the wrapper).  Bounded per invocation by
    # spark.sql.execution.arrow.maxRecordsPerBatch; off the hot path —
    # no graph or pipeline kernel routes through these ops.  The ufunc
    # object itself is not cloudpickle-able, so it is (re)built per
    # batch on the worker — construction is a constant-time wrapper.
    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("double", PandasUDFType.SCALAR)
    def _udf(s):
        ufunc = np.frompyfunc(_safe, 1, 1)
        arr = s.to_numpy(dtype=np.float64, na_value=np.nan)
        return pd.Series(ufunc(arr).astype(np.float64))

    return _udf


# transcendentals without Spark SQL builtins (reference unary catalog):
# resolved lazily so importing ops.py needs no active session
unary.erf = lambda x: _scalar_math_udf("erf")(x)
unary.erfc = lambda x: _scalar_math_udf("erfc")(x)
unary.lgamma = lambda x: _scalar_math_udf("lgamma")(x)
unary.tgamma = lambda x: _scalar_math_udf("gamma")(x)


def _frexp_udf():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pyspark.sql.functions import PandasUDFType

    # np.frexp is a true numpy ufunc — fully vectorized, bit-identical
    # to math.frexp on finite doubles (both call the C library frexp).
    @pandas_udf("struct<mantissa: double, exponent: int>", PandasUDFType.SCALAR)
    def _udf(s):
        arr = s.to_numpy(dtype=np.float64, na_value=np.nan)
        mant, expo = np.frexp(arr)
        expo = np.where(np.isnan(arr), 0, expo)
        return pd.DataFrame({"mantissa": mant, "exponent": expo.astype(np.int32)})

    return _udf


unary.frexpx = lambda x: _frexp_udf()(x)["mantissa"]
unary.frexpe = lambda x: _frexp_udf()(x)["exponent"].cast("long")


# ---------------------------------------------------------------------------
# BinaryOp: (left, right) -> value
# ---------------------------------------------------------------------------
binary = _Namespace(
    first=lambda a, b: a,
    second=lambda a, b: b,
    pair=lambda a, b: F.lit(1),
    oneb=lambda a, b: F.lit(1),
    any=lambda a, b: a,  # documented nondeterminism in the reference (monoid.py:188-191)
    plus=lambda a, b: a + b,
    minus=lambda a, b: a - b,
    rminus=lambda a, b: b - a,
    times=lambda a, b: a * b,
    truediv=lambda a, b: a / b,
    div=lambda a, b: a / b,
    rdiv=lambda a, b: b / a,
    min=F.least,
    max=F.greatest,
    pow=F.pow,
    fmod=lambda a, b: a % b,
    remainder=lambda a, b: a % b,
    atan2=F.atan2,
    hypot=F.hypot,
    copysign=lambda a, b: F.abs(a) * F.when(b < 0, F.lit(-1)).otherwise(F.lit(1)),
    ldexp=lambda a, b: a * F.pow(F.lit(2.0), b),
    # comparison returning BOOL (GrB eq/ne/gt/lt/ge/le)
    eq=lambda a, b: a == b,
    ne=lambda a, b: a != b,
    gt=lambda a, b: a > b,
    lt=lambda a, b: a < b,
    ge=lambda a, b: a >= b,
    le=lambda a, b: a <= b,
    # comparison returning operand dtype (GrB iseq/isne/... return 0/1 typed)
    iseq=lambda a, b: (a == b).cast("long"),
    isne=lambda a, b: (a != b).cast("long"),
    isgt=lambda a, b: (a > b).cast("long"),
    islt=lambda a, b: (a < b).cast("long"),
    isge=lambda a, b: (a >= b).cast("long"),
    isle=lambda a, b: (a <= b).cast("long"),
    # boolean
    lor=lambda a, b: a | b,
    land=lambda a, b: a & b,
    lxor=lambda a, b: a != b,
    lxnor=lambda a, b: a == b,
    # bitwise
    bor=lambda a, b: a.bitwiseOR(b),
    band=lambda a, b: a.bitwiseAND(b),
    bxor=lambda a, b: a.bitwiseXOR(b),
    bxnor=lambda a, b: F.bitwise_not(a.bitwiseXOR(b)),
    # bit-position ops (reference operator catalog bget/bset/bclr/bshift):
    # b = bit index for get/set/clr; negative b shifts right for bshift.
    # call_function: the SQL shift functions accept column bit counts,
    # while the F.shiftleft/right Python wrappers only take int literals
    bget=lambda a, b: F.call_function("shiftright", a, b).bitwiseAND(F.lit(1)),
    bset=lambda a, b: a.bitwiseOR(F.call_function("shiftleft", F.lit(1).cast("long"), b)),
    bclr=lambda a, b: a.bitwiseAND(
        F.bitwise_not(F.call_function("shiftleft", F.lit(1).cast("long"), b))),
    bshift=lambda a, b: F.when(b >= 0, F.call_function("shiftleft", a, b))
    .otherwise(F.call_function("shiftright", a, -b)),
)


# ---------------------------------------------------------------------------
# Monoid: associative binary op + identity; drives groupBy().agg reductions.
# Each entry: (agg_builder, identity, pairwise binary for 2-operand merges)
# ---------------------------------------------------------------------------
class Monoid:
    """Associative ⊕ with identity.

    ``agg`` builds the Spark aggregate Column (partial+final aggregation —
    map-side combine — is automatic in Catalyst, matching the reference's
    2-phase aggregator recipes ``core/operator/agg.py:156-288``).
    ``pairwise`` merges two scalar Columns (used by ewise_add / accum).
    """

    def __init__(self, name, agg, pairwise, identity):
        self.name = name
        self.agg = agg
        self.pairwise = pairwise
        self.identity = identity

    def __repr__(self):
        return f"monoid.{self.name}"


def _prod_agg(c: Column) -> Column:
    # product monoid via exp∘sum∘log with sign/zero bookkeeping (JVM-side)
    mag = F.exp(F.sum(F.log(F.abs(F.nullif(c.cast("double"), F.lit(0.0))))))
    n_neg = F.sum(F.when(c < 0, 1).otherwise(0))
    has_zero = F.max(F.when(c == 0, 1).otherwise(0)) == 1
    signed = F.when(n_neg % 2 == 1, -mag).otherwise(mag)
    return F.when(has_zero, F.lit(0.0)).otherwise(signed)


monoid = _Namespace(
    plus=Monoid("plus", F.sum, binary.plus, 0),
    times=Monoid("times", _prod_agg, binary.times, 1),
    min=Monoid("min", F.min, binary.min, None),
    max=Monoid("max", F.max, binary.max, None),
    any=Monoid("any", F.first, binary.first, None),
    lor=Monoid("lor", F.bool_or, binary.lor, False),
    land=Monoid("land", F.bool_and, binary.land, True),
    lxor=Monoid("lxor", lambda c: F.sum(c.cast("long")) % 2 == 1, binary.lxor, False),
    lxnor=Monoid("lxnor", lambda c: F.sum((~c).cast("long")) % 2 == 0, binary.lxnor, True),
    eq=Monoid("eq", lambda c: F.sum((~c).cast("long")) % 2 == 0, binary.lxnor, True),
    bor=Monoid("bor", lambda c: F.bit_or(c), binary.bor, 0),
    band=Monoid("band", lambda c: F.bit_and(c), binary.band, -1),
    bxor=Monoid("bxor", lambda c: F.bit_xor(c), binary.bxor, 0),
)


# ---------------------------------------------------------------------------
# IndexUnaryOp: (v, i, j, thunk) -> value/bool  (reference indexunary.py:95-115)
# Used by apply(indexunary.*) and select(...). Row/col positions are just
# the i/j columns of the edge DataFrame.
# ---------------------------------------------------------------------------
indexunary = _Namespace(
    rowindex=lambda v, i, j, thunk=0: i + F.lit(thunk),
    colindex=lambda v, i, j, thunk=0: j + F.lit(thunk),
    diagindex=lambda v, i, j, thunk=0: j - (i + F.lit(thunk)),
    tril=lambda v, i, j, thunk=0: j <= i + F.lit(thunk),
    triu=lambda v, i, j, thunk=0: j >= i + F.lit(thunk),
    diag=lambda v, i, j, thunk=0: j == i + F.lit(thunk),
    offdiag=lambda v, i, j, thunk=0: j != i + F.lit(thunk),
    colle=lambda v, i, j, thunk=0: j <= F.lit(thunk),
    colgt=lambda v, i, j, thunk=0: j > F.lit(thunk),
    rowle=lambda v, i, j, thunk=0: i <= F.lit(thunk),
    rowgt=lambda v, i, j, thunk=0: i > F.lit(thunk),
    valueeq=lambda v, i, j, thunk=0: v == F.lit(thunk),
    valuene=lambda v, i, j, thunk=0: v != F.lit(thunk),
    valuegt=lambda v, i, j, thunk=0: v > F.lit(thunk),
    valuege=lambda v, i, j, thunk=0: v >= F.lit(thunk),
    valuelt=lambda v, i, j, thunk=0: v < F.lit(thunk),
    valuele=lambda v, i, j, thunk=0: v <= F.lit(thunk),
    # the reference's positional UNARY ops (unary.positioni/positionj and
    # their +1 variants, operator/unary.py) are index functions, so they
    # live here: apply(indexunary.positioni) == reference
    # apply(unary.positioni)
    positioni=lambda v, i, j, thunk=0: i + F.lit(thunk),
    positioni1=lambda v, i, j, thunk=0: i + F.lit(thunk) + F.lit(1),
    positionj=lambda v, i, j, thunk=0: j + F.lit(thunk),
    positionj1=lambda v, i, j, thunk=0: j + F.lit(thunk) + F.lit(1),
)


# ---------------------------------------------------------------------------
# Aggregators (reference agg/__init__.py catalog) — whole/row/col reductions
# beyond plain monoids. Composite ones (mean, std, ...) are multi-agg +
# finalize, exactly like the reference's 2-phase recipes (agg.py:156-288).
# ---------------------------------------------------------------------------
class PositionalAgg:
    """Aggregator over (value, index) pairs — the reference's positional
    aggregators first/last/first_index/last_index (agg/__init__.py:1-75),
    which plain single-column aggregates can't express.  ``build(v, idx)``
    returns the Spark aggregate Column; 'first' = value at the smallest
    stored index, 'last' at the largest."""

    def __init__(self, name, build):
        self.name = name
        self.build = build

    def __repr__(self):
        return f"agg.{self.name}"

    # single-column call intentionally unsupported: positional aggregators
    # need the index column; reduce_*_agg detects this type and supplies it
    def __call__(self, *_args, **_kw):
        raise TypeError(
            f"agg.{self.name} is positional — use reduce_rowwise_agg / "
            f"reduce_columnwise_agg / Vector.reduce_agg, which pass the index"
        )


agg = _Namespace(
    sum=F.sum,
    prod=_prod_agg,
    all=F.bool_and,
    any=F.bool_or,
    min=F.min,
    max=F.max,
    any_value=F.first,
    count=F.count,
    count_nonzero=lambda c: F.sum(F.when(c != 0, 1).otherwise(0)),
    count_zero=lambda c: F.sum(F.when(c == 0, 1).otherwise(0)),
    sum_of_squares=lambda c: F.sum(c * c),
    sum_of_inverses=lambda c: F.sum(F.lit(1.0) / c),
    exists=lambda c: F.when(F.count(c) > 0, 1),
    mean=F.avg,
    peak_to_peak=lambda c: F.max(c) - F.min(c),
    varp=F.var_pop,
    vars=F.var_samp,
    stdp=F.stddev_pop,
    stds=F.stddev_samp,
    geometric_mean=lambda c: F.exp(F.avg(F.log(c))),
    harmonic_mean=lambda c: F.count(c) / F.sum(F.lit(1.0) / c),
    root_mean_square=lambda c: F.sqrt(F.avg(c * c)),
    hypot=lambda c: F.sqrt(F.sum(c * c)),
    logaddexp=lambda c: F.log(F.sum(F.exp(c))),
    logaddexp2=lambda c: F.log2(F.sum(F.pow(F.lit(2.0), c))),
    L0_norm=lambda c: F.sum(F.when(c != 0, 1).otherwise(0)),
    L1_norm=lambda c: F.sum(F.abs(c)),
    L2_norm=lambda c: F.sqrt(F.sum(c * c)),
    Linf_norm=lambda c: F.max(F.abs(c)),
    first=PositionalAgg("first", lambda v, idx: F.min_by(v, idx)),
    last=PositionalAgg("last", lambda v, idx: F.max_by(v, idx)),
    first_index=PositionalAgg("first_index", lambda v, idx: F.min(idx)),
    last_index=PositionalAgg("last_index", lambda v, idx: F.max(idx)),
)


# ---------------------------------------------------------------------------
# Complex dtypes FC32/FC64 (reference core/dtypes.py:13, gated on the
# backend; op catalog GxB_CONJ/CREAL/CIMAG/CARG + polymorphic arithmetic).
# Spark has no complex atomic type; the declared SURVEY §1.2 mapping is a
# struct<re: double, im: double> value column.  The reference's arithmetic
# ops are dtype-polymorphic; our ops are Column-expression builders, so the
# complex forms get explicit c-prefixed names — same kernels, same algebra,
# all pure JVM expressions (no UDF anywhere on this path).
# ---------------------------------------------------------------------------
def _cplx(re: Column, im: Column) -> Column:
    return F.struct(re.alias("re"), im.alias("im"))


unary.conj = lambda z: _cplx(z["re"], -z["im"])
unary.creal = lambda z: z["re"]
unary.cimag = lambda z: z["im"]
unary.carg = lambda z: F.atan2(z["im"], z["re"])
unary.cabs = lambda z: F.sqrt(z["re"] * z["re"] + z["im"] * z["im"])
unary.cainv = lambda z: _cplx(-z["re"], -z["im"])
# 1/z = conj(z) / |z|^2
unary.cminv = lambda z: _cplx(
    z["re"] / (z["re"] * z["re"] + z["im"] * z["im"]),
    -z["im"] / (z["re"] * z["re"] + z["im"] * z["im"]),
)
unary.cone = lambda z: _cplx(F.lit(1.0), F.lit(0.0))

binary.cmplx = lambda re, im: _cplx(re.cast("double"), im.cast("double"))
binary.cplus = lambda a, b: _cplx(a["re"] + b["re"], a["im"] + b["im"])
binary.cminus = lambda a, b: _cplx(a["re"] - b["re"], a["im"] - b["im"])
binary.ctimes = lambda a, b: _cplx(
    a["re"] * b["re"] - a["im"] * b["im"],
    a["re"] * b["im"] + a["im"] * b["re"],
)
# a/b = a * conj(b) / |b|^2
binary.cdiv = lambda a, b: _cplx(
    (a["re"] * b["re"] + a["im"] * b["im"]) / (b["re"] * b["re"] + b["im"] * b["im"]),
    (a["im"] * b["re"] - a["re"] * b["im"]) / (b["re"] * b["re"] + b["im"] * b["im"]),
)
binary.ceq = lambda a, b: (a["re"] == b["re"]) & (a["im"] == b["im"])
binary.cfirst = lambda a, b: a
binary.csecond = lambda a, b: b


# -- parameterized builtin: isclose (the reference's canonical
# ParameterizedBinaryOp — graphblas.binary.isclose(rel_tol, abs_tol),
# core/operator/binary.py:243-247 `_isclose`): SYMMETRIC math.isclose
# semantics, `a == b or |a − b| <= max(rel_tol·max(|a|,|b|), abs_tol)`,
# boolean output.  (numpy.isclose is asymmetric in b and would give
# order-dependent results the reference does not — e.g. rel_tol=0.05:
# isclose(100, 95) is True here and in the reference, False under
# numpy's |a−b| <= abs+rel·|b|.)  Non-finite inputs fall back to the
# a == b short-circuit alone (math.isclose semantics: inf matches only
# same-signed inf, NaN matches nothing) rather than the reference's
# unguarded scalar arithmetic, whose inf handling is an artifact
# (inf <= rel_tol·inf makes inf "close" to any finite value).  Both the
# JVM Column path and the ndarray oracle live on the op, so the
# registry-driven opcatalog sweep differentials every sample
# parameterization automatically.
def _isclose_factory(rel_tol: float = 1e-7, abs_tol: float = 0.0):
    def op(a, b):
        # |a−b| on non-finite inputs computes inf−inf = NaN (false), and
        # Spark's NaN = NaN is TRUE (non-IEEE), so both branches need
        # explicit handling to agree with the ndarray oracle.
        finite = (~F.isnan(a)) & (~F.isnan(b)) \
            & (F.abs(a) != F.lit(float("inf"))) \
            & (F.abs(b) != F.lit(float("inf")))
        close = F.abs(a - b) <= F.greatest(
            F.lit(rel_tol) * F.greatest(F.abs(a), F.abs(b)), F.lit(abs_tol))
        return F.when(finite, (a == b) | close) \
            .otherwise((a == b) & ~F.isnan(a))
    return op


def _isclose_np_factory(rel_tol: float = 1e-7, abs_tol: float = 0.0):
    import numpy as np

    def kernel(a, b):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        with np.errstate(invalid="ignore"):
            eq = a == b
            close = np.abs(a - b) <= np.maximum(
                rel_tol * np.maximum(np.abs(a), np.abs(b)), abs_tol)
            finite = np.isfinite(a) & np.isfinite(b)
        return np.where(finite, eq | close, eq)

    return kernel


binary.isclose = ParameterizedOp(
    _isclose_factory, np_factory=_isclose_np_factory, dtype="boolean",
    name="isclose", arity=2, samples=((), (1e-3,), (0.05, 0.25)))

# ⊕ monoid over complex: component-wise sum packaged back into the struct.
# Partial aggregation (map-side combine) applies to both component sums.
monoid.cplus = Monoid(
    "cplus",
    lambda c: F.struct(F.sum(c["re"]).alias("re"), F.sum(c["im"]).alias("im")),
    binary.cplus,
    (0.0, 0.0),
)

# FC32 storage-preserving variants (reference FC32 ops are the same
# dtype-polymorphic kernels at complex64 width, core/dtypes.py:13): the
# field arithmetic is already width-agnostic, but Spark's SUM over float
# returns double, so the FC32 monoid casts the component sums back to
# float to keep struct<re: float, im: float> storage through mxm/reduce.
binary.cmplx32 = lambda re, im: _cplx(re.cast("float"), im.cast("float"))
binary.cplus_fc32 = lambda a, b: _cplx(
    (a["re"] + b["re"]).cast("float"), (a["im"] + b["im"]).cast("float"))
monoid.cplus_fc32 = Monoid(
    "cplus_fc32",
    lambda c: F.struct(F.sum(c["re"]).cast("float").alias("re"),
                       F.sum(c["im"]).cast("float").alias("im")),
    binary.cplus_fc32,
    (0.0, 0.0),
)


# ---------------------------------------------------------------------------
# numpy alias namespaces — unary.numpy.* / binary.numpy.* (reference
# graphblas/unary/numpy.py:17-70 and binary/numpy.py): numpy-ufunc names
# resolving to the SAME builtin Column builders where the semantics agree
# (the reference's `mapnumpy` path, unary/numpy.py:80-110), plus the few
# numpy-only ufuncs Spark expresses directly (square, sign, reciprocal,
# deg2rad/rad2deg, signbit, floor_divide, logaddexp/logaddexp2,
# float_power).  Names the reference itself EXCLUDES for semantic drift
# (remainder/mod/fmod sign rules, left/right_shift, gcd/lcm, nextafter,
# spacing) are excluded here too — absence is parity, not a gap.
# ---------------------------------------------------------------------------
unary.numpy = _Namespace(
    # mapped builtins (reference _numpy_to_graphblas, unary/numpy.py:71-110)
    negative=unary.ainv, abs=unary.abs, absolute=unary.abs, fabs=unary.abs,
    cbrt=unary.cbrt, exp=unary.exp, exp2=unary.exp2,
    # np.rint rounds half to EVEN (like C rint); F.round is HALF_UP, so
    # rint maps to bround (HALF_EVEN), not to unary.round
    rint=lambda c: F.bround(c),
    log=unary.log, log2=unary.log2, log10=unary.log10, expm1=unary.expm1,
    log1p=unary.log1p, positive=unary.identity, sqrt=unary.sqrt,
    sin=unary.sin, cos=unary.cos, tan=unary.tan,
    arcsin=unary.asin, arccos=unary.acos, arctan=unary.atan,
    sinh=unary.sinh, cosh=unary.cosh, tanh=unary.tanh,
    arcsinh=unary.asinh, arccosh=unary.acosh, arctanh=unary.atanh,
    bitwise_not=unary.bnot, invert=unary.bnot, logical_not=unary.lnot,
    isfinite=unary.isfinite, isinf=unary.isinf, isnan=unary.isnan,
    floor=unary.floor, ceil=unary.ceil, trunc=unary.trunc,
    conj=unary.conj, conjugate=unary.conj,
    # numpy-only ufuncs, expressed as JVM Column expressions
    # (reciprocal is excluded like the reference excludes it from
    # mapnumpy — "has differences" — and ANSI mode raises on 1/0)
    square=lambda c: c * c,
    sign=lambda c: F.signum(c),
    deg2rad=lambda c: F.radians(c),
    radians=lambda c: F.radians(c),
    rad2deg=lambda c: F.degrees(c),
    degrees=lambda c: F.degrees(c),
    # Spark SQL normalizes -0.0 to +0.0 on ingestion, so a column never
    # holds a signed zero and x < 0 is exact over representable values.
    # NaN guard: Spark orders NaN above every number, so plain < is
    # already False there, matching numpy signbit(nan).
    signbit=lambda c: c.cast("double") < 0,
)

binary.numpy = _Namespace(
    # mapped builtins (reference binary/numpy.py _numpy_to_graphblas)
    add=binary.plus, subtract=binary.minus, multiply=binary.times,
    divide=binary.truediv, true_divide=binary.truediv, power=binary.pow,
    arctan2=binary.atan2, hypot=binary.hypot, copysign=binary.copysign,
    ldexp=binary.ldexp,
    bitwise_and=binary.band, bitwise_or=binary.bor, bitwise_xor=binary.bxor,
    greater=binary.gt, greater_equal=binary.ge,
    less=binary.lt, less_equal=binary.le,
    not_equal=binary.ne, equal=binary.eq,
    logical_and=binary.land, logical_or=binary.lor, logical_xor=binary.lxor,
    # numpy NaN contract: maximum/minimum PROPAGATE NaN, fmax/fmin IGNORE
    # it.  Spark orders NaN above every number, so greatest propagates it
    # but least silently drops it — each of the four needs its own form.
    maximum=lambda a, b: F.when(F.isnan(a) | F.isnan(b),
                                F.lit(float("nan"))).otherwise(F.greatest(a, b)),
    minimum=lambda a, b: F.when(F.isnan(a) | F.isnan(b),
                                F.lit(float("nan"))).otherwise(F.least(a, b)),
    fmax=lambda a, b: F.when(F.isnan(a), b).when(F.isnan(b), a)
    .otherwise(F.greatest(a, b)),
    fmin=lambda a, b: F.when(F.isnan(a), b).when(F.isnan(b), a)
    .otherwise(F.least(a, b)),
    # numpy-only ufuncs
    float_power=lambda a, b: F.pow(a.cast("double"), b.cast("double")),
    floor_divide=lambda a, b: F.floor(a / b),
    # stable log(exp(a)+exp(b)) = max + log1p(exp(-|a-b|)); equal
    # infinities short-circuit (|inf-inf| = NaN would poison the result:
    # np.logaddexp(-inf, -inf) is -inf, the zero-probability identity)
    logaddexp=lambda a, b: F.when((a == b) & (F.abs(a) == F.lit(float("inf"))), a)
    .otherwise(F.greatest(a, b) + F.log1p(F.exp(-F.abs(a - b)))),
    logaddexp2=lambda a, b: F.when((a == b) & (F.abs(a) == F.lit(float("inf"))), a)
    .otherwise(F.greatest(a, b)
               + F.log2(F.lit(1.0) + F.pow(F.lit(2.0), -F.abs(a - b)))),
)

# monoid.numpy.* (reference graphblas/monoid/numpy.py: numpy-named monoids
# resolving to builtins under mapnumpy; gcd/lcm are numba-only there and
# have no Spark builtin — excluded, absence is parity).  hypot and
# logaddexp(2) have no builtin monoid, so they get real Monoid objects:
# the n-ary folds of their pairwise forms have closed forms as single
# aggregates (sqrt of the square sum; log of the exp sum — the latter is
# the unstabilized form, same overflow domain as the reference's pairwise
# numba fold for large inputs).
monoid.numpy = _Namespace(
    add=monoid.plus, multiply=monoid.times,
    # numpy NaN contract over folds: maximum/minimum PROPAGATE NaN,
    # fmax/fmin IGNORE it.  Spark sorts NaN above every number, so the
    # MAX aggregate already propagates (alias) but MIN silently ignores
    # (needs a propagating Monoid); conversely fmin can alias MIN while
    # fmax needs a NaN-filtered aggregate (all-NaN input lands on NULL —
    # the empty-reduction convention used across the engine).
    maximum=monoid.max,
    minimum=Monoid("numpy.minimum",
                   lambda c: F.when(F.max(F.isnan(c).cast("int")) == 1,
                                    F.lit(float("nan"))).otherwise(F.min(c)),
                   binary.numpy.minimum, None),
    fmax=Monoid("numpy.fmax",
                lambda c: F.max(F.when(~F.isnan(c), c)),
                binary.numpy.fmax, None),
    fmin=monoid.min,
    bitwise_and=monoid.band, bitwise_or=monoid.bor, bitwise_xor=monoid.bxor,
    equal=monoid.eq, logical_and=monoid.land, logical_or=monoid.lor,
    logical_xor=monoid.lxor,
    hypot=Monoid("numpy.hypot", lambda c: F.sqrt(F.sum(c * c)),
                 binary.hypot, 0.0),
    logaddexp=Monoid("numpy.logaddexp",
                     lambda c: F.log(F.sum(F.exp(c))),
                     binary.numpy.logaddexp, float("-inf")),
    logaddexp2=Monoid("numpy.logaddexp2",
                      lambda c: F.log2(F.sum(F.pow(F.lit(2.0), c))),
                      binary.numpy.logaddexp2, float("-inf")),
)
