"""Property-based test for the round-9 SQ8 debut.

The sq8_topk docstring's load-bearing claim is SCALE CANCELLATION:
the per-vector quantization scale (max|v|/127) divides out of cosine,
so rescaling any candidate vector must not change its codes' direction
— and therefore not change a single output value. Powers of two make
the property EXACT (binary-float multiplication by 2^j rescales every
intermediate — scale, codes input, dot, norm — without rounding), so
the test demands bit-equality of the full result frame, not tolerance.
One Spark job pair per hypothesis example (same budget reasoning as
test_round7_properties.py).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

DIM = 8
VEC = st.lists(
    st.floats(
        min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False
    # snap tiny magnitudes to zero: scaling a subnormal by 2^-6 is the
    # one float op here that CAN round, which would break bit-equality
    ).map(lambda x: 0.0 if abs(x) < 1e-3 else x),
    min_size=DIM,
    max_size=DIM,
).filter(lambda v: any(abs(x) > 1e-3 for x in v))
CORPUS = st.lists(VEC, min_size=4, max_size=10)


@SLOW
@given(vecs=CORPUS, j=st.integers(-6, 6))
def test_sq8_scale_invariance_bit_exact(spark, vecs, j):
    from map_reduce_c_sharp_simulation_multithreaded_spark.operators.similarity import (
        sq8_topk,
    )

    s = 2.0 ** j

    def run(scale):
        df = spark.createDataFrame(
            [(i, [x * scale for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        q = df.filter("vec_id < 2")
        return sorted(
            tuple(r)
            for r in sq8_topk(
                df, q, "vec_id", "embedding", k=3, k_prime=4
            ).collect()
        )

    assert run(1.0) == run(s)
