"""Deterministic Cricsheet-shaped demo matches, shared by the test
suite and the driver-facing end-to-end pipeline query.

Covers the schema-drift matrix the reference defends against
(SURVEY.md §5.2 / FIXTURES.md §B.1): v1.1.0 `batter` vs v1.0.0
`striker` naming, wickets as list vs single dict, missing `ball`,
missing `runs.total`, unparseable dates, every outcome variant, the
full `_id` fallback chain, and one corrupt file for the quarantine
path (S2).
"""

from __future__ import annotations

import json
import os
import tempfile

DEMO_MATCHES: dict[str, dict] = {
    "a.json": {
        "meta": {"data_version": "1.1.0"},
        "info": {
            "match_id": "M1",
            "dates": ["2021-03-01"],
            "team_type": "international",
            "match_type": "ODI",
            "gender": "male",
            "teams": ["India", "NZ"],
            "venue": "MCA Stadium",
            "city": "Pune",
            "officials": {"umpires": ["U1", "U2"]},
            "outcome": {"winner": "India", "by": {"runs": 20}},
        },
        "innings": [
            {
                "team": "India",
                "innings": 1,
                "overs": [
                    {
                        "over": 0,
                        "deliveries": [
                            {
                                "batter": "V Kohli",
                                "non_striker": "RG Sharma",
                                "bowler": "TG Southee",
                                "ball": 1,
                                "runs": {"batter": 4, "extras": 0, "total": 4},
                            },
                            {
                                "batter": "V Kohli",
                                "non_striker": "RG Sharma",
                                "bowler": "TG Southee",
                                "ball": 2,
                                "runs": {"batter": 0, "extras": 1},
                            },
                            {
                                "batter": "RG Sharma",
                                "non_striker": "V Kohli",
                                "bowler": "TG Southee",
                                "ball": 3,
                                "runs": {"batter": 6, "extras": 0, "total": 6},
                            },
                        ],
                    },
                    {
                        "over": 1,
                        "deliveries": [
                            {
                                "batter": "V Kohli",
                                "non_striker": "RG Sharma",
                                "bowler": "T Boult",
                                "runs": {"batter": 0, "extras": 0, "total": 0},
                                "wickets": [
                                    {"player_out": "V Kohli", "kind": "bowled"}
                                ],
                            }
                        ],
                    },
                ],
            },
            {
                "team": "NZ",
                "number": 2,
                "overs": [
                    {
                        "over": 0,
                        "deliveries": [
                            {
                                "striker": "K Williamson",
                                "nonStriker": "D Conway",
                                "bowler": "J Bumrah",
                                "ball": 1,
                                "runs": {"batter": 2, "extras": 0, "total": 2},
                            },
                            {
                                "striker": "K Williamson",
                                "nonStriker": "D Conway",
                                "bowler": "J Bumrah",
                                "ball": 2,
                                "runs": {"batter": 0, "extras": 0, "total": 0},
                                "wicket": {
                                    "player_out": "K Williamson",
                                    "kind": "caught",
                                },
                            },
                        ],
                    }
                ],
            },
        ],
    },
    "b.json": {
        "meta": {"data_version": "1.0.0"},
        "info": {
            "registry": {"match": "R2"},
            "dates": ["bad-date"],
            "match_type": "T20",
            "outcome": {"result": "no result"},
        },
        "innings": [],
    },
    "c.json": {
        "info": {
            "event": {"match_number": 77},
            "dates": [],
            "outcome": {"winner": "X"},
        },
        "innings": [],
    },
    "d.json": {
        "info": {
            "city": "Delhi",
            "dates": ["2020-01-02"],
            "outcome": {"winner": "Y", "by": {"wickets": 5}},
        },
        "innings": [],
    },
}

CORRUPT_FILE = ("corrupt.json", "{ this is not json")


def demo_files_values_sql() -> str:
    """The fixture dump as a SQL ``VALUES`` list of
    ``(name, raw_json_text)`` pairs — the exact bytes
    ``write_demo_dir`` writes, so a DuckDB oracle can re-run the
    whole ETL (parse → quarantine → 3-level flatten → aggregate)
    from the same source without touching the staged directory.
    Single quotes are SQL-escaped; the corrupt file rides along so
    the oracle's TRY_CAST-to-JSON replays the S2 quarantine split."""
    rows = []
    for name in sorted(DEMO_MATCHES):
        txt = json.dumps(DEMO_MATCHES[name]).replace("'", "''")
        rows.append(f"('{name}', '{txt}')")
    cname, payload = CORRUPT_FILE
    rows.append(f"('{cname}', '{payload.replace(chr(39), chr(39) * 2)}')")
    return ", ".join(rows)


def write_demo_dir(include_corrupt: bool = True) -> str:
    """Materialize the fixture dump in a temp dir; file names are
    written in sorted order (T5 — the reference sorts its input
    listing, etl_cricsheet_to_mongo.py:129)."""
    d = tempfile.mkdtemp(prefix="cricsheet_demo_")
    for name in sorted(DEMO_MATCHES):
        with open(os.path.join(d, name), "w") as fh:
            json.dump(DEMO_MATCHES[name], fh)
    if include_corrupt:
        name, payload = CORRUPT_FILE
        with open(os.path.join(d, name), "w") as fh:
            fh.write(payload)
    return d
