"""End-to-end crawl-loop integration test (SURVEY.md §3.1 + §3.3):
two crawl rounds over synthetic HTML — discovery via the frontier
anti-join, page upsert, link replacement, degree maintenance, and
re-crawl scheduling all composing correctly."""

from __future__ import annotations

import pytest

from tropology_spark.pipeline import crawl


def page_html(code: str, title: str, links: list[str]) -> str:
    anchors = "".join(
        f'<a href="/pmwiki/pmwiki.php/{l}">x</a>' for l in links
    )
    return (
        f"<html><head><title>{title}</title>"
        f'<meta property="og:url" content="http://tvtropes.org/pmwiki/pmwiki.php/{code}"/>'
        f"</head><body>{anchors}</body></html>"
    )


def url_of(code: str) -> str:
    return f"http://tvtropes.org/pmwiki/pmwiki.php/{code}"


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "store")


def test_two_round_crawl(spark, store):
    # Round 1: crawl two seed work pages linking to tropes.
    seed = spark.createDataFrame(
        [
            (url_of("Anime/CowboyBebop"),
             page_html("Anime/CowboyBebop", "Cowboy Bebop",
                       ["Main/SpaceWestern", "Main/BountyHunter"])),
            (url_of("Film/Alien"),
             page_html("Film/Alien", "Alien",
                       ["Main/SpaceWestern", "Main/ChestBurster"])),
        ],
        "url string, html string",
    )
    crawl.crawl_batch(spark, store, seed, now="2026-08-13 00:00:00")

    pages = {r["code"]: r for r in crawl.read_pages(spark, store).collect()}
    assert set(pages) == {"anime/cowboybebop", "film/alien"}
    assert pages["anime/cowboybebop"]["outgoing"] == 2
    assert pages["anime/cowboybebop"]["incoming"] == 0
    assert str(pages["film/alien"]["next_update"]).startswith("2026-09-12")

    # Frontier now discovers the three linked-but-uncrawled tropes.
    f1 = {r["code"] for r in crawl.frontier(spark, store, now="2026-08-13 01:00:00").collect()}
    assert f1 == {"main/spacewestern", "main/bountyhunter", "main/chestburster"}

    # Round 2: crawl the discovered tropes (one links back).
    batch2 = spark.createDataFrame(
        [
            (url_of("Main/SpaceWestern"),
             page_html("Main/SpaceWestern", "Space Western", ["Anime/CowboyBebop"])),
            (url_of("Main/BountyHunter"),
             page_html("Main/BountyHunter", "Bounty Hunter", [])),
            (url_of("Main/ChestBurster"),
             page_html("Main/ChestBurster", "Chest Burster", [])),
        ],
        "url string, html string",
    )
    crawl.crawl_batch(spark, store, batch2, now="2026-08-13 02:00:00")

    pages = {r["code"]: r for r in crawl.read_pages(spark, store).collect()}
    assert len(pages) == 5
    # Degree maintenance: backlink arrived, cached degrees refreshed.
    assert pages["anime/cowboybebop"]["incoming"] == 1
    assert pages["main/spacewestern"]["incoming"] == 2
    assert pages["main/spacewestern"]["outgoing"] == 1

    # Frontier is empty until backoff elapses...
    assert crawl.frontier(spark, store, now="2026-08-20 00:00:00").count() == 0
    # ...then the earliest-crawled pages come due first (top-k order).
    due = {r["code"] for r in crawl.frontier(spark, store, now="2026-09-12 00:30:00").collect()}
    assert due == {"anime/cowboybebop", "film/alien"}


def test_recrawl_replaces_links_idempotently(spark, store):
    v1 = spark.createDataFrame(
        [(url_of("Anime/X"), page_html("Anime/X", "X", ["Main/A", "Main/B"]))],
        "url string, html string",
    )
    crawl.crawl_batch(spark, store, v1, now="2026-08-13 00:00:00")
    assert crawl.read_links(spark, store).count() == 2

    # Re-crawl: one link removed, one added → replacement, not append.
    v2 = spark.createDataFrame(
        [(url_of("Anime/X"), page_html("Anime/X", "X", ["Main/A", "Main/C"]))],
        "url string, html string",
    )
    crawl.crawl_batch(spark, store, v2, now="2026-09-01 00:00:00")
    links = {(r["from_code"], r["to_code"]) for r in crawl.read_links(spark, store).collect()}
    assert links == {("anime/x", "main/a"), ("anime/x", "main/c")}

    # Replaying the identical batch changes nothing (idempotent).
    crawl.crawl_batch(spark, store, v2, now="2026-09-01 00:00:00")
    links2 = {(r["from_code"], r["to_code"]) for r in crawl.read_links(spark, store).collect()}
    assert links2 == links
    assert crawl.read_pages(spark, store).count() == 1
