"""Multi-format date parsing truth table vs the reference's whitelist
(meerkat_abacus/codes/variable.py:368-380 allowed_formats), with Python
strptime as the model — one example per format, plus garbage/empty → NULL.
"""

import datetime

from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.dates import parse_multiformat_timestamp

CASES = [
    # (input string, reference strptime format or None for no-parse)
    ("Sep 4, 2017", "%b %d, %Y"),
    ("4-Sep-2017", "%d-%b-%Y"),
    ("2017-09-04", "%Y-%m-%d"),
    ("4-Sep-2017 01:02:03", "%d-%b-%Y %H:%M:%S"),
    ("4-Sep-2017 13:45:59", "%d-%b-%Y %H:%M:%S"),
    ("Sep 4, 2017 1:02:03 PM", "%b %d, %Y %I:%M:%S %p"),
    ("2017-09-04T01:02:03.500000", "%Y-%m-%dT%H:%M:%S.%f"),
    ("2017-09-04T01:02:03.500000Z", "%Y-%m-%dT%H:%M:%S.%fZ"),
    ("2017-09-04T01:02:03", "%Y-%m-%dT%H:%M:%S"),
    ("not a date", None),
    ("", None),
    ("32-Sep-2017", None),
]


def test_multiformat_truth_table(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], ["s"])
    got = {
        r["s"]: r["ts"]
        for r in df.select(
            "s", parse_multiformat_timestamp(F.col("s")).alias("ts")
        ).collect()
    }
    for s, fmt in CASES:
        if fmt is None:
            assert got[s] is None, (s, got[s])
        else:
            expected = datetime.datetime.strptime(s, fmt)
            assert got[s] == expected, (s, got[s], expected)
