"""Property-based invariants (SURVEY.md §5.2) via hypothesis.

Pure-Python properties run per-example; Spark-backed properties collect
one batched example set (a Spark job per hypothesis example would take
minutes)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from whakoom_webscrapper_spark import imaging
from whakoom_webscrapper_spark.functions import urls as U
from whakoom_webscrapper_spark.operators.bloom import Bloom

hosts = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,10}(\.[A-Za-z]{2,4}){1,2}", fullmatch=True)
paths = st.lists(
    st.text(alphabet="abcdefXYZ019-_", min_size=1, max_size=8), max_size=4
).map(lambda segs: "/" + "/".join(segs))
queries_st = st.lists(
    st.tuples(
        st.text(alphabet="abcxyz", min_size=1, max_size=4),
        st.text(alphabet="0123456789", min_size=1, max_size=4),
    ),
    max_size=4,
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(hosts)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(paths)
    q = draw(queries_st)
    qs = ("?" + "&".join(f"{k}={v}" for k, v in q)) if q else ""
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{port}{path}{qs}{frag}"


def test_canonicalize_idempotent_and_fragment_free(spark):
    # one batched Spark job over a deterministic URL-shape grid (a Spark
    # job per hypothesis example would take minutes)
    schemes = ["http", "https", "HTTP", "Https"]
    batch = []
    for i in range(60):
        host = f"Host{i}.Example.COM"
        port = ["", ":80", ":443", ":8080"][i % 4]
        path = "/" + "/".join(f"s{j}" for j in range(i % 4))
        qs = "?b=2&a=1" if i % 3 == 0 else ""
        frag = "#frag" if i % 2 == 0 else ""
        batch.append(f"{schemes[i % 4]}://{host}{port}{path}{qs}{frag}")
    df = spark.createDataFrame([(u,) for u in batch], ["url"])
    once = [r[0] for r in df.select(U.canonicalize_url(F.col("url"))).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], ["url"])
    twice = [r[0] for r in df2.select(U.canonicalize_url(F.col("url"))).collect()]
    assert once == twice
    assert all("#" not in u for u in once)
    assert all(u.split("://")[1].split("/")[0].islower() or ":" in u for u in once)


@settings(max_examples=30, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=500,
    )
)
def test_bloom_never_false_negative(keys):
    b = Bloom(1 << 14, 5)
    arr = np.array(keys, dtype=np.int64)
    b.add_many(arr)
    assert b.may_contain_many(arr).all()


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=8, max_value=96),
    h=st.integers(min_value=8, max_value=96),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_roundtrip_any_size(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (imaging.decode_png(imaging.encode_png(px)) == px).all()


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=16, max_value=64),
    h=st.integers(min_value=16, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_psnr_gate_any_image(w, h, seed):
    """Uniform white noise is the adversarial worst case for a DCT codec:
    at the default quality (q98, near-unit quant steps) even that stays
    over the 40 dB lossy gate, so any real image clears it with margin."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = imaging.decode_image(imaging.encode_image(px, "jpeg"), "jpeg")
    assert imaging.psnr(px, out) >= 40.0
