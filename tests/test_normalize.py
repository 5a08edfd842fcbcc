from reden_ray.core.normalize import decompose, normalize_mention, uri_file_key


def test_normalize_strips_ws_apostrophe_hyphen_and_lowercases():
    assert normalize_mention("Jeanne d'Arc") == "jeannedarc"
    assert normalize_mention("Saint-Malo") == "saintmalo"
    assert normalize_mention("  Victor\tHugo\n") == "victorhugo"
    assert normalize_mention("Gau-tier") == "gautier"


def test_normalize_keeps_diacritics():
    assert normalize_mention("Éluard") == "éluard"


def test_normalize_idempotent():
    for s in ["Jeanne d'Arc", "Saint-Malo", "ÉLUARD", "a b-c'd"]:
        once = normalize_mention(s)
        assert normalize_mention(once) == once


def test_uri_file_key():
    assert uri_file_key("http://kb.test/ent/1") == "http--kb.test-ent-1"


def test_decompose_percent_decoding_only_for_http():
    assert decompose("http://kb.test/Caf%C3%A9") == "http://kb.test/Café"
    assert decompose("https://kb.test/Caf%C3%A9") == "https://kb.test/Caf%C3%A9"
    assert decompose("plain literal") == "plain literal"


def test_decompose_plus_becomes_space_like_urldecoder():
    assert decompose("http://kb.test/a+b") == "http://kb.test/a b"


def test_reencode_tilde_matches_java_urlencoder():
    """Java URLEncoder percent-encodes '~' (%7E); Python's quoter treats
    it as RFC-3986 unreserved.  Retry keys must follow Java."""
    from reden_ray.core.normalize import reencode_legacy_ascii

    assert reencode_legacy_ascii("http://kb.test/ent/name~alias") == (
        "http://kb.test/ent/name%7Ealias"
    )
