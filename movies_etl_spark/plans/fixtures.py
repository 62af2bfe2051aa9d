"""Deterministic miniature inputs shaped like the reference's three files
(FIXTURES.md): wiki movie JSON (ragged keys, mixed scalar/list cells,
synonym keys, junk columns), kaggle metadata CSV, ratings CSV.

Used by the fixture test suite AND by the `movies_etl_*` driver-contract
queries (rows-only checks — the pipeline's inputs are not pre-registered
oracle views).
"""

from __future__ import annotations

import csv
import json
import os


def imdb_url(n: int) -> str:
    return f"https://www.imdb.com/title/tt{n:07d}/"


def wiki_records() -> list[dict]:
    recs = []
    recs.append({
        "url": "https://en.wikipedia.org/wiki/A",
        "year": 1990,
        "imdb_link": imdb_url(1),
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
    recs.append({
        "url": "https://en.wikipedia.org/wiki/B",
        "year": 1991,
        "imdb_link": imdb_url(2),
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
    recs.append({
        "url": "https://en.wikipedia.org/wiki/C",
        "year": 1990,
        "imdb_link": imdb_url(1),
        "title": "Alpha Duplicate",
        "Directed by": "Dir C",
        "Box office": "$5 milion",
    })
    recs.append({"url": "u", "year": 1992, "Directed by": "Dir D", "title": "D"})
    recs.append({
        "url": "u", "year": 1993, "imdb_link": imdb_url(5),
        "Directed by": "Dir E", "No. of episodes": 10, "title": "E",
    })
    recs.append({"url": "u", "year": 1994, "imdb_link": imdb_url(6), "title": "F"})
    recs.append({
        "url": "https://en.wikipedia.org/wiki/G",
        "year": 1996,
        "imdb_link": imdb_url(7),
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
    recs.append({
        "url": "https://en.wikipedia.org/wiki/H",
        "year": 1997,
        "imdb_link": imdb_url(8),
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
    junk_keys = ["Genre", "Original network", "Preceded by", "Followed by",
                 "Narrated by", "Animation by", "Color process", "Budget notes"]
    for i, junk in enumerate(junk_keys):
        recs.append({
            "url": f"https://en.wikipedia.org/wiki/F{i}",
            "year": 1980 + i,
            "imdb_link": imdb_url(100 + i),
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


def kaggle_rows() -> list[dict]:
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
        row(3, 15, "Adult M", 1, 1, 1, adult="True"),
        row(4, 16, "Corrupt", 1, 1, 1, adult="weird"),
        row(999, 17, "NoWiki", 1, 1, 1),
    ]


def ratings_rows() -> list[tuple]:
    return [
        (1, 11, 5.0, 1000000000),
        (2, 11, 5.0, 1000000100),
        (3, 11, 3.0, 1000000200),
        (1, 12, 0.5, 1000000300),
        (2, 13, 4.0, 1000000400),
        (9, 999999, 2.0, 1000000500),
    ]


def write_fixture_files(target_dir: str) -> tuple[str, str, str]:
    """Materialize the three input files; returns their paths."""
    os.makedirs(target_dir, exist_ok=True)
    wiki = os.path.join(target_dir, "wiki.json")
    with open(wiki, "w") as f:
        json.dump(wiki_records(), f)
    kag = os.path.join(target_dir, "kaggle.csv")
    with open(kag, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=KAGGLE_COLUMNS)
        w.writeheader()
        w.writerows(kaggle_rows())
    rat = os.path.join(target_dir, "ratings.csv")
    with open(rat, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["userId", "movieId", "rating", "timestamp"])
        w.writerows(ratings_rows())
    return wiki, kag, rat
