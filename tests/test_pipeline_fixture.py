"""Reference-shaped fixture suite (SURVEY.md §5, FIXTURES.md): miniature
wiki JSON / kaggle CSV / ratings CSV exercising the full pipeline
composition, with hand-computed golden expectations mirroring the
reference's behavior (challenge.py:18-314):

- P1 key-existence filter (drop no-director / no-imdb-link / episodes)
- D1 dedup by imdb_id, first-in-file-order wins
- P9/P10 synonym coalesce (last-rename-wins priority) + alt-title map
- P5 90%-null column pruning (data-dependent projection)
- F3-F11 money/date/runtime parsing incl. the single-digit-day quirk
- P2/F12-F14 kaggle filter + casts, J1 merge, F15 precedence fills,
  P6/P8 final projection + rename, A1-A3/F16/J2 ratings block
"""

from __future__ import annotations

import csv
import json
import os

import pytest

from movies_etl_spark.plans import pipeline


def _imdb(n: int) -> str:
    return f"https://www.imdb.com/title/tt{n:07d}/"


def _wiki_records() -> list[dict]:
    recs = []
    # A: list-valued release date, money forms, alt title, synonym director
    recs.append({
        "url": "https://en.wikipedia.org/wiki/A",
        "year": 1990,
        "imdb_link": _imdb(1),
        "title": "Alpha",
        "Directed by": "Dir A",
        "Starring": ["Actor One", "Actor Two"],
        "Cinematography": "Cam A",
        "Based on": "Book A",
        "Country of origin": "US",
        "Distributed by": "Dist A",
        "Box office": "$21.4 million",
        "Budget": "$20 million",
        "Release date": ["May 17, 1990", "(", "1990-05-17", ")"],
        "Running time": "102 minutes",
        "French": "Alpha FR",
    })
    # B: billion + range-budget, Written by beats Story by, year-only date
    recs.append({
        "url": "https://en.wikipedia.org/wiki/B",
        "year": 1991,
        "imdb_link": _imdb(2),
        "title": "Beta",
        "Director": "Dir B",
        "Starring": "Solo Star",
        "Cinematography": "Cam B",
        "Based on": "Book B",
        "Country": "UK",
        "Distributor": "Dist B",
        "Written by": "Writer Won",
        "Story by": "Writer Lost",
        "Box office": "$1.2 billion",
        "Budget": "$79.6–80.2 million",
        "Release date": "1991",
        "Running time": "1 hour 42 minutes",
    })
    # C: duplicate imdb link of A — dedup must keep A (first in file)
    recs.append({
        "url": "https://en.wikipedia.org/wiki/C",
        "year": 1990,
        "imdb_link": _imdb(1),
        "title": "Alpha Duplicate",
        "Directed by": "Dir C",
        "Box office": "$5 milion",  # misspelling tolerated by regex
    })
    # D: no imdb_link — filtered out
    recs.append({"url": "u", "year": 1992, "Directed by": "Dir D", "title": "D"})
    # E: TV series (episodes) — filtered out
    recs.append({
        "url": "u", "year": 1993, "imdb_link": _imdb(5),
        "Directed by": "Dir E", "No. of episodes": 10, "title": "E",
    })
    # F: no director key at all — filtered out
    recs.append({"url": "u", "year": 1994, "imdb_link": _imdb(6), "title": "F"})
    # G: comma-form money, month-year date, bare-hours runtime
    recs.append({
        "url": "https://en.wikipedia.org/wiki/G",
        "year": 1996,
        "imdb_link": _imdb(7),
        "title": "Gamma",
        "Directed by": "Dir G",
        "Starring": ["Gal Actor"],
        "Cinematography": "Cam G",
        "Based on": "Book G",
        "Country of origin": "FR",
        "Distributed by": "Dist G",
        "Box office": "N/A",
        "Budget": "$123,456,789",
        "Release date": "July 1996",
        "Running time": "2 hr",
    })
    # H: Length→Running time, Released→Release date chain, Producer beats
    # Produced by; single-digit-day quirk ("July 3, 1997" → 1997-01-01)
    recs.append({
        "url": "https://en.wikipedia.org/wiki/H",
        "year": 1997,
        "imdb_link": _imdb(8),
        "title": "Eta",
        "Director": "Dir H",
        "Starring": "Hero",
        "Cinematography": "Cam H",
        "Based on": "Book H",
        "Country": "DE",
        "Distributor": "Dist H",
        "Producer": "Prod Win",
        "Produced by": "Prod Lose",
        "Length": "95 minutes",
        "Released": "July 3, 1997",
        "Box office": "$3.5 million",
        "Budget": "$2 million",
    })
    # 8 fillers: keep shared columns under the 90% null line; each carries
    # one unique junk key (present exactly once overall → pruned at 12 recs)
    junk_keys = ["Genre", "Original network", "Preceded by", "Followed by",
                 "Narrated by", "Animation by", "Color process", "Budget notes"]
    for i, junk in enumerate(junk_keys):
        recs.append({
            "url": f"https://en.wikipedia.org/wiki/F{i}",
            "year": 1980 + i,
            "imdb_link": _imdb(100 + i),
            "title": f"Filler{i}",
            "Directed by": f"Dir F{i}",
            "Starring": f"Star F{i}",
            "Cinematography": f"Cam F{i}",
            "Based on": f"Book F{i}",
            "Country of origin": "US",
            "Distributed by": f"Dist F{i}",
            "Written by": f"Writer F{i}",
            "Produced by": f"Prod F{i}",
            "French": f"Filler FR {i}",
            "Box office": f"${i + 1} million",
            "Budget": f"${i + 1},000,000",
            "Release date": f"January 1{i}, 198{i}",
            "Running time": f"{90 + i} minutes",
            junk: f"junk{i}",
        })
    return recs


KAGGLE_COLUMNS = [
    "adult", "belongs_to_collection", "budget", "genres", "homepage", "id",
    "imdb_id", "original_language", "original_title", "overview",
    "popularity", "poster_path", "production_companies",
    "production_countries", "release_date", "revenue", "runtime",
    "spoken_languages", "status", "tagline", "title", "video",
    "vote_average", "vote_count",
]


def _kaggle_rows() -> list[dict]:
    def row(imdb_n, kid, title, budget, revenue, runtime, adult="False"):
        return {
            "adult": adult,
            "belongs_to_collection": "",
            "budget": str(budget),
            "genres": "[{'id': 1, 'name': 'Drama'}]",
            "homepage": "",
            "id": str(kid),
            "imdb_id": f"tt{imdb_n:07d}",
            "original_language": "en",
            "original_title": title,
            "overview": f"about {title}",
            "popularity": "1.5",
            "poster_path": "/x.jpg",
            "production_companies": "[]",
            "production_countries": "[]",
            "release_date": "1990-05-17",
            "revenue": str(revenue),
            "runtime": str(runtime),
            "spoken_languages": "[]",
            "status": "Released",
            "tagline": "",
            "title": title,
            "video": "False",
            "vote_average": "7.0",
            "vote_count": "100",
        }

    return [
        row(1, 11, "Alpha K", budget=20000000, revenue=30000000, runtime=0),
        row(2, 12, "Beta K", budget=50000000, revenue=0, runtime=100),
        row(7, 13, "Gamma K", budget=0, revenue=40000000, runtime=110),
        row(8, 14, "Eta K", budget=3000000, revenue=5000000, runtime=95),
        row(3, 15, "Adult M", 1, 1, 1, adult="True"),     # P2: dropped
        row(4, 16, "Corrupt", 1, 1, 1, adult="weird"),    # P2: dropped too
        row(999, 17, "NoWiki", 1, 1, 1),                  # inner join: dropped
    ]


def _ratings_rows() -> list[tuple]:
    # movie 11: 2×5.0 + 1×3.0 ; movie 12: 1×0.5 ; movie 13: 1×4.0
    # movie 14 (Eta): NO ratings → nulls after left join (challenge.py
    # fills rating_* BEFORE the join, not after)
    return [
        (1, 11, 5.0, 1000000000),
        (2, 11, 5.0, 1000000100),
        (3, 11, 3.0, 1000000200),
        (1, 12, 0.5, 1000000300),
        (2, 13, 4.0, 1000000400),
        (9, 999999, 2.0, 1000000500),  # unknown movie
    ]


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("movies_fixture")
    wiki = d / "wiki.json"
    wiki.write_text(json.dumps(_wiki_records()))
    kag = d / "kaggle.csv"
    with open(kag, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=KAGGLE_COLUMNS)
        w.writeheader()
        w.writerows(_kaggle_rows())
    rat = d / "ratings.csv"
    with open(rat, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["userId", "movieId", "rating", "timestamp"])
        w.writerows(_ratings_rows())
    return str(wiki), str(kag), str(rat)


@pytest.fixture(scope="module")
def outputs(spark, fixture_paths):
    wiki, kag, rat = fixture_paths
    return pipeline.run_pipeline(spark, wiki, kag, rat)


def test_wiki_filter_dedup_prune(spark, fixture_paths):
    wiki, _, _ = fixture_paths
    from movies_etl_spark.sources import readers

    raw = readers.read_json_records(spark, wiki, multiline=True)
    assert raw.count() == 16  # golden: raw records
    cleaned = pipeline.clean_wiki(raw)
    rows = {r["imdb_id"]: r.asDict() for r in cleaned.collect()}
    # 16 raw → 13 after P1 (D,E,F dropped) → 12 after dedup (C dropped)
    assert len(rows) == 12
    # dedup kept FIRST occurrence (A, not C)
    assert rows["tt0000001"]["title"] == "Alpha"
    # junk keys present on exactly 1/12 records → ≥90% null → pruned
    for junk in ["Genre", "Original network", "Preceded by", "Budget notes"]:
        assert junk not in cleaned.columns
    # parsing golden values
    a = rows["tt0000001"]
    assert a["box_office"] == pytest.approx(21.4e6)
    assert a["budget"] == pytest.approx(20e6)
    assert str(a["release_date"]) == "1990-05-17"  # list cell, ISO form
    assert a["running_time"] == pytest.approx(102.0)
    b = rows["tt0000002"]
    assert b["box_office"] == pytest.approx(1.2e9)
    assert b["budget"] == pytest.approx(80.2e6)  # range → upper value
    assert str(b["release_date"]) == "1991-01-01"  # bare year
    assert b["running_time"] == pytest.approx(102.0)  # 1h42m
    assert b["Writer(s)"] == "Writer Won"  # Written by beats Story by
    g = rows["tt0000007"]
    assert g["box_office"] is None  # N/A
    assert g["budget"] == pytest.approx(123456789.0)
    assert str(g["release_date"]) == "1996-07-01"  # month-year form
    assert g["running_time"] == pytest.approx(120.0)  # "2 hr"
    h = rows["tt0000008"]
    assert h["running_time"] == pytest.approx(95.0)  # Length synonym
    # single-digit day falls through to bare-year form (reference quirk)
    assert str(h["release_date"]) == "1997-01-01"
    assert h["Producer(s)"] == "Prod Win"  # Producer beats Produced by
    # alt-title map collected
    assert rows["tt0000001"]["alt_titles"] == {"French": "Alpha FR"}


def test_movies_output(outputs):
    movies = outputs["movies"]
    rows = {r["imdb_id"]: r.asDict() for r in movies.collect()}
    # inner join: only A,B,G,H have kaggle rows with adult=False
    assert set(rows) == {"tt0000001", "tt0000002", "tt0000007", "tt0000008"}
    # final rename applied
    assert "kaggle_id" in movies.columns and "wikipedia_url" in movies.columns
    assert movies.columns[0] == "imdb_id"
    # F15 precedence fills
    assert rows["tt0000001"]["runtime"] == pytest.approx(102.0)  # 0 → wiki
    assert rows["tt0000002"]["revenue"] == pytest.approx(1.2e9)  # 0 → wiki
    assert rows["tt0000007"]["budget"] == pytest.approx(123456789.0)  # 0 → wiki
    # non-zero kaggle values NOT overwritten
    assert rows["tt0000008"]["runtime"] == pytest.approx(95.0)
    assert rows["tt0000008"]["budget"] == pytest.approx(3000000)
    # kaggle title wins the 'title' slot
    assert rows["tt0000001"]["title"] == "Alpha K"


def test_movies_ratings_output(outputs):
    mr = outputs["movies_ratings"]
    rows = {r["imdb_id"]: r.asDict() for r in mr.collect()}
    assert len(rows) == 4
    a = rows["tt0000001"]
    assert a["rating_5.0"] == 2 and a["rating_3.0"] == 1
    assert a["rating_0.5"] == 0  # fillna(0) pre-join
    b = rows["tt0000002"]
    assert b["rating_0.5"] == 1
    # Eta has no ratings at all → left-join nulls (challenge.py behavior)
    h = rows["tt0000008"]
    assert h["rating_5.0"] is None and h["rating_0.5"] is None
    # 10 pivot columns present
    assert sum(c.startswith("rating_") for c in mr.columns) == 10


def test_ratings_output(outputs):
    ratings = outputs["ratings"].collect()
    assert len(ratings) == 6
    ts = {r["userId"]: r["timestamp"] for r in ratings if r["movieId"] == 11}
    import datetime

    assert ts[1] == datetime.datetime(2001, 9, 9, 1, 46, 40)  # epoch 1e9 UTC
