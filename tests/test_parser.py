"""Query-string parser semantics (viewer.py:62-84 behavior)."""

from aspublic_spark.query.parser import parse_query, parse_websearch


def test_plain_terms():
    p = parse_query("hello world")
    assert p.and_terms == ["hello", "world"]
    assert p.phrases == [] and p.not_terms == []


def test_not_word_both_sigils():
    p = parse_query("keep !drop -gone")
    assert p.and_terms == ["keep"]
    assert sorted(p.not_terms) == ["drop", "gone"]


def test_phrase():
    p = parse_query('find "sample status" here')
    assert p.and_terms == ["find", "here"]
    assert p.phrases == [["sample", "status"]]


def test_negated_phrase_becomes_conjunctive_not_group():
    # the reference emits negated phrases unquoted (db_sqlite.py:125-126)
    # and FTS5's implicit AND binds tighter than NOT, so the effective
    # semantics is NOT (bad AND phrase): only docs with BOTH words are
    # excluded -> a conjunctive NOT group, not independent NOT terms
    p = parse_query('term !"bad phrase"')
    assert p.and_terms == ["term"]
    assert p.not_terms == []
    assert p.not_groups == [["bad", "phrase"]]
    assert p.phrases == []
    # single-word negated "phrase" degenerates to a plain NOT term
    p1 = parse_query('term !"bad"')
    assert p1.not_terms == ["bad"] and p1.not_groups == []


def test_tokenizer_applied_to_query():
    p = parse_query('CAFÉ !Wörld "Héllo There"')
    assert p.and_terms == ["cafe"]
    assert p.not_terms == ["world"]
    assert p.phrases == [["hello", "there"]]


def test_empty_and_punct():
    assert parse_query("").is_empty()
    assert parse_query("!!! ...").is_empty() or parse_query("!!! ...").and_terms == []


def test_websearch_or():
    p = parse_websearch("cat OR dog fish")
    assert p.or_groups == [["cat", "dog"]]
    assert p.and_terms == ["fish"]


def test_websearch_neg_and_phrase():
    p = parse_websearch('-spam "exact match" ham OR eggs')
    assert p.not_terms == ["spam"]
    assert p.phrases == [["exact", "match"]]
    assert p.or_groups == [["ham", "eggs"]]


def test_websearch_negated_phrase_keeps_adjacency():
    # websearch_to_tsquery('-"a b"') -> !(a <-> b): exclusion requires
    # the exact adjacent phrase, unlike the sqlite backend's NOT group
    p = parse_websearch('keep -"bad phrase"')
    assert p.and_terms == ["keep"]
    assert p.not_phrases == [["bad", "phrase"]]
    assert p.not_terms == [] and p.not_groups == []


def test_positive_terms_dedup_ordered():
    p = parse_query('a b "a c" b')
    assert p.positive_terms == ["a", "b", "c"]


def test_websearch_or_with_phrase_operand():
    # a phrase in an OR chain stays a phrase ALTERNATIVE with adjacency
    # (websearch_to_tsquery keeps `<->` inside OR, db_postgres.py:114),
    # and must NOT silently become a required conjunct
    p = parse_websearch('cat OR "big dog"')
    assert p.or_groups == [["cat"]]
    assert p.or_phrase_groups == [[["big", "dog"]]]
    assert p.and_terms == [] and p.phrases == []
    p2 = parse_websearch('"big dog" OR cat fish')
    assert p2.or_groups == [["cat"]]
    assert p2.or_phrase_groups == [[["big", "dog"]]]
    assert p2.and_terms == ["fish"]
    # single-token phrase operand is just a term alternative
    p3 = parse_websearch('"cat" OR dog')
    assert p3.or_groups == [["cat", "dog"]]
    assert p3.or_phrase_groups == [[]]
    assert p3.positive_terms == ["cat", "dog"]
