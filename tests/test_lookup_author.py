"""jobs/lookup_author.py — the retrieve_name.py analog over the
snapshot: id normalization, field defaults, not-found path."""

import importlib.util
import json
import os


def _mod():
    spec = importlib.util.spec_from_file_location(
        "lookup_author",
        os.path.join(
            os.path.dirname(__file__), "..", "jobs", "lookup_author.py"
        ),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_lookup_author_info(spark, tmp_path):
    m = _mod()
    recs = [
        {
            "id": "https://openalex.org/A1",
            "display_name": "Ada Lovelace",
            "works_count": 12,
            "summary_stats": {
                "h_index": 7, "i10_index": 5, "2yr_mean_citedness": 1.5,
            },
            "affiliations": [
                {"institution": {
                    "id": "https://openalex.org/I1",
                    "display_name": "Analytical Engine Institute",
                    "country_code": "GB",
                }},
            ],
        },
        # trimmed record: stats/affiliations absent -> N/A defaults
        {"id": "https://openalex.org/A2", "display_name": "Bo Li",
         "works_count": 3},
    ]
    with open(tmp_path / "authors.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    # bare id, URL form, and the reference's api/people form all work
    for raw in ("A1", "https://openalex.org/A1",
                "https://api.openalex.org/people/A1"):
        info = m.get_author_info(spark, str(tmp_path), raw)
        assert info["author_name"] == "Ada Lovelace"
        assert info["summary_stats"]["h_index"] == 7
        assert info["institutions"][0]["country"] == "GB"

    trimmed = m.get_author_info(spark, str(tmp_path), "A2")
    assert trimmed["summary_stats"]["h_index"] == "N/A"
    assert trimmed["institutions"] == []

    missing = m.get_author_info(spark, str(tmp_path), "A9")
    assert "error" in missing
