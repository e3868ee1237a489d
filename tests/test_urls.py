from newscrawler_ray.functions.urls import (
    canonicalize_batch,
    canonicalize_url,
    host_of,
    is_blocked,
    url_hash64,
)


def test_canonicalize_variants_collapse():
    canon = "http://site.example.com/p/1"
    for raw in [
        "http://site.example.com/p/1",
        "https://site.example.com/p/1",
        "http://www.site.example.com/p/1",
        "http://SITE.example.com/p/1/",
        "https://site.example.com:443/p/1#frag",
        "http://site.example.com:80/p/1",
    ]:
        assert canonicalize_url(raw) == canon, raw


def test_canonicalize_keeps_query_and_port():
    assert canonicalize_url("https://a.com:8080/x?q=1#f") == "http://a.com:8080/x?q=1"


def test_root_path_strips_slash():
    assert canonicalize_url("http://a.com/") == "http://a.com"


def test_host_of():
    assert host_of("https://WWW.News.Example.org/x") == "news.example.org"


def test_hash_stable():
    assert url_hash64("http://a.com/x") == url_hash64("http://a.com/x")
    assert url_hash64("http://a.com/x") != url_hash64("http://a.com/y")


def test_is_blocked_subdomain_suffix():
    bl = frozenset({"bad.com"})
    assert is_blocked("bad.com", bl)
    assert is_blocked("sub.bad.com", bl)
    assert not is_blocked("notbad.com", bl)
    assert not is_blocked("bad.com.evil.org", bl)


def test_strip_publisher_suffix():
    from newscrawler_ray.functions.text import strip_publisher_suffix

    assert strip_publisher_suffix("Big News - The Daily") == "Big News"
    assert strip_publisher_suffix("No suffix here") == "No suffix here"
    assert strip_publisher_suffix("A - B - C") == "A - B"


def test_canonicalize_batch_matches_scalar():
    urls = ["https://www.A.com/x/", "http://b.com/y#z", "http://c.com:8080/q?a=1"]
    canon, hosts, hashes = canonicalize_batch(urls)
    assert canon == [canonicalize_url(u) for u in urls]
    assert hosts == [host_of(u) for u in urls]
    assert list(hashes) == [url_hash64(c) for c in canon]
