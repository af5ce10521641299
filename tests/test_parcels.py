"""Compressed parcel-list grammar vs the reference's own test table.

Cases mirror /root/reference/lib/pipeline/nsw_lrs/property_description/
parse/tests/test_parse.py:17-342 (folio expansion + residue).  The Spark
restatement is window-function based (operators/parcels.py) — these pin
the sequential-cursor semantics case by case.
"""

from __future__ import annotations

import pytest

from aus_land_data_etl_spark.operators.parcels import (
    expand_parcels,
    parcel_residue,
)

# (desc, expected [(folio_id, part)...] in reading order, residue tokens)
CASES = [
    ("123//313", [("123/313", False)], ""),
    ("123/313", [("123/313", False)], ""),
    ("PT 123/313", [("123/313", True)], ""),
    ("123/as/313", [("123/as/313", False)], ""),
    ("1, 2/313", [("1/313", False), ("2/313", False)], ""),
    (
        "1, PT 2, 3/313",
        [("1/313", False), ("2/313", True), ("3/313", False)],
        "",
    ),
    (
        "1, PT 2/123 PT 5, 3/313",
        [
            ("1/123", False),
            ("2/123", True),
            ("5/313", True),
            ("3/313", False),
        ],
        "",
    ),
    (
        "PT 1/123 PT 2/223 PT 5/323",
        [("1/123", True), ("2/223", True), ("5/323", True)],
        "",
    ),
    # id/flag patterns follow the parcels → residue from the break
    (
        "650/751743 Non-Irrigable Purchase 15",
        [("650/751743", False)],
        "Non-Irrigable Purchase 15",
    ),
    (
        "B/100895 6, PT 20/755520 Enclosure Permit 510145",
        [("B/100895", False), ("6/755520", False), ("20/755520", True)],
        "Enclosure Permit 510145",
    ),
    (
        "PT 135, PT 210, PT 211/756913 Wind Farm AN614034",
        [("135/756913", True), ("210/756913", True), ("211/756913", True)],
        "Wind Farm AN614034",
    ),
    ("25/7511 95.19/CRK", [("25/7511", False)], "95.19/CRK"),
    ("1329/748788 PTARC/ARC20", [("1329/748788", False)], "PTARC/ARC20"),
    ("PT 200/713995 HCP9014/2", [("200/713995", True)], "HCP9014/2"),
    ("1/804780 PM2005/000756", [("1/804780", False)], "PM2005/000756"),
    (
        "PT 10/1142773 and lease - Waterways Authority 3313",
        [("10/1142773", True)],
        "and lease - Waterways Authority 3313",
    ),
    (
        "6/G/12312 Permissive Occupancy 67/15",
        [("6/G/12312", False)],
        "Permissive Occupancy 67/15",
    ),
    # the reference's stress case: many groups, licence residue
    (
        "257, 258/722505 259, 260, 261/722511 262, 263/722516 "
        "1, 2, 3/728619 1, 2/728620 "
        "23, 25, 26, 36, 80, 81, 82, 83, 84, 90, 92, 94, 95, 97, 98, "
        "251/756472 "
        "Licence over 258/722505, 260, 261/722511, 263/722516 Licence 396466",
        [
            ("257/722505", False),
            ("258/722505", False),
            ("259/722511", False),
            ("260/722511", False),
            ("261/722511", False),
            ("262/722516", False),
            ("263/722516", False),
            ("1/728619", False),
            ("2/728619", False),
            ("3/728619", False),
            ("1/728620", False),
            ("2/728620", False),
        ]
        + [
            (f"{lot}/756472", False)
            for lot in [
                23, 25, 26, 36, 80, 81, 82, 83, 84, 90, 92, 94, 95, 97, 98,
                251,
            ]
        ],
        "Licence over 258/722505, 260, 261/722511, 263/722516 Licence 396466",
    ),
    (
        "1/252283 6, 31/755497 25/755511 93, 102, /755532",
        [
            ("1/252283", False),
            ("6/755497", False),
            ("31/755497", False),
            ("25/755511", False),
            ("93/755532", False),
            ("102/755532", False),
        ],
        "",
    ),
    # unparseable from token 0: everything is residue
    (
        "/13586 PH WAMMERA PT DP 13586 MEJUM STATE FOREST NO 378",
        [],
        "/13586 PH WAMMERA PT DP 13586 MEJUM STATE FOREST NO 378",
    ),
    # strata list: CP/SP + plan number distributes over the lots
    (
        "1, 2, 3, CP/SP 23170 1/80500 LOT 1 DP 80500",
        [
            ("1/SP23170", False),
            ("2/SP23170", False),
            ("3/SP23170", False),
            ("CP/SP23170", False),
            ("1/80500", False),
        ],
        "LOT 1 DP 80500",
    ),
    ("41/753705 Lease Number 10/30", [("41/753705", False)], "Lease Number 10/30"),
]


@pytest.fixture(scope="module")
def parsed(spark):
    rows = [(i, desc) for i, (desc, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, desc string")
    folios = {}
    for r in sorted(
        expand_parcels(df).collect(), key=lambda r: (r["doc_id"], r["pos"])
    ):
        folios.setdefault(r["doc_id"], []).append((r["folio_id"], r["part"]))
    residues = {
        r["doc_id"]: r["residue"] for r in parcel_residue(df).collect()
    }
    return folios, residues


@pytest.mark.parametrize("case_id", range(len(CASES)))
def test_parcel_case(parsed, case_id):
    desc, expected, residue = CASES[case_id]
    folios, residues = parsed
    assert folios.get(case_id, []) == expected, desc
    assert residues[case_id] == residue, desc
