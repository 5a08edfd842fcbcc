from reden_ray.core.aliases import (
    make_aliases,
    normalized_name,
    truncate_rejected_form,
)


def test_basic_male_author_aliases():
    got = set(make_aliases("Victor", "Hugo", "male"))
    assert {
        "Victor Hugo",
        "Hugo",
        "M Hugo",
        "M. Hugo",
        "M Victor Hugo",
        "M. Victor Hugo",
        "V Hugo",
        "V. Hugo",
    } <= got
    assert not any(a.startswith("Mme") for a in got)


def test_female_title():
    got = set(make_aliases("George", "Sand", "female"))
    assert "Mme Sand" in got and "Mme. Sand" in got


def test_no_firstname_dash():
    got = set(make_aliases("-", "Colette", "female"))
    assert "Colette" in got
    assert "- Colette" not in got


def test_honorific_particle():
    got = set(make_aliases("Honoré de", "Balzac", "male"))
    assert "de Balzac" in got and "De Balzac" in got
    assert "M de Balzac" in got and "M. De Balzac" in got


def test_multi_uppercase_initials():
    got = set(make_aliases("Jean-Paul", "Sartre", "male"))
    assert "J P Sartre" in got
    assert "J. P. Sartre" in got


def test_normalized_name():
    assert normalized_name("Victor", "Hugo", "1802", "1885") == "Hugo, Victor (1802-1885)"
    assert normalized_name("-", "Colette") == "Colette"
    assert normalized_name("Jeanne", "d'Arc") == "d' Arc, Jeanne"


def test_truncate_rejected_form():
    assert truncate_rejected_form("Hugo, Victor (1802-1885)") == "Hugo, Victor"
    assert truncate_rejected_form("Hugo") == "Hugo"
