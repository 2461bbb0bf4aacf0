"""Deterministic fixture vocabulary: word→lemma and word→POS dictionaries.

Stand-in for the reference's RussianLuceneMorphology dependency
(reference: dto/indexing/Lemmatizator.java:14-17 builds
RussianLuceneMorphology; :42-52 takes the FIRST normal form; :84-95 drops a
word when ANY of its morph analyses carries МЕЖД/ПРЕДЛ/СОЮЗ). We do not
depend on Lucene; instead the engine takes an explicit (word→lemma,
word→[tags]) dictionary, and this module provides the committed, seeded
fixture instance used by tests, bench, and the golden model.

Everything here is computed at import time from constants + seed 42 —
no wall clock, no os randomness — so golden model and Spark see identical
dictionaries.
"""

from __future__ import annotations

import numpy as np

# Tags whose presence in ANY analysis drops the word (Lemmatizator.java:12).
DROP_TAGS = frozenset({"МЕЖД", "ПРЕДЛ", "СОЮЗ"})

# --- real Russian inflection families: lemma -> inflected forms ------------
_REAL_FAMILIES: dict[str, list[str]] = {
    "лес": ["леса", "лесу", "лесом", "лесе"],
    "дом": ["дома", "дому", "домом", "доме"],
    "кот": ["кота", "коту", "котом", "коте"],
    "вода": ["воды", "воде", "воду", "водой"],
    "рука": ["руки", "руке", "руку", "рукой"],
    "город": ["города", "городу", "городом", "городе"],
    "стол": ["стола", "столу", "столом", "столе"],
    "окно": ["окна", "окну", "окном", "окне"],
    "книга": ["книги", "книге", "книгу", "книгой"],
    "слово": ["слова", "слову", "словом", "слове"],
    "день": ["дня", "дню", "днем", "дне"],
    "ночь": ["ночи", "ночью"],
    "год": ["года", "году", "годом", "годе"],
    "работа": ["работы", "работе", "работу", "работой"],
    "поиск": ["поиска", "поиску", "поиском", "поиске"],
    "запрос": ["запроса", "запросу", "запросом", "запросе"],
    "индекс": ["индекса", "индексу", "индексом", "индексе"],
    "система": ["системы", "системе", "систему", "системой"],
    "файл": ["файла", "файлу", "файлом", "файле"],
    "код": ["кода", "коду", "кодом", "коде"],
    "тест": ["теста", "тесту", "тестом", "тесте"],
    "сервер": ["сервера", "серверу", "сервером", "сервере"],
    "строка": ["строки", "строке", "строку", "строкой"],
    "число": ["числа", "числу", "числом", "числе"],
    "список": ["списка", "списку", "списком", "списке"],
    "функция": ["функции", "функцию", "функцией"],
    "задача": ["задачи", "задаче", "задачу", "задачей"],
    "модель": ["модели", "моделью"],
    "поток": ["потока", "потоку", "потоком", "потоке"],
    "таблица": ["таблицы", "таблице", "таблицу", "таблицей"],
    "ключ": ["ключа", "ключу", "ключом", "ключе"],
    "значение": ["значения", "значению", "значением", "значении"],
    "память": ["памяти", "памятью"],
    "диск": ["диска", "диску", "диском", "диске"],
    "сеть": ["сети", "сетью"],
    "узел": ["узла", "узлу", "узлом", "узле"],
    "вектор": ["вектора", "вектору", "вектором", "векторе"],
    "документ": ["документа", "документу", "документом", "документе"],
    "текст": ["текста", "тексту", "текстом", "тексте"],
    "искать": ["ищет", "искал", "искала", "искали"],
    "делать": ["делает", "делал", "делала", "делали"],
    "читать": ["читает", "читал", "читала", "читали"],
    "писать": ["пишет", "писал", "писала", "писали"],
    "работать": ["работает", "работал", "работали"],
    "ответ": ["ответа", "ответу", "ответом", "ответе"],
    "вопрос": ["вопроса", "вопросу", "вопросом", "вопросе"],
    "результат": ["результата", "результату", "результатом", "результате"],
    "агент": ["агента", "агенту", "агентом", "агенте"],
    "команда": ["команды", "команде", "команду", "командой"],
    "журнал": ["журнала", "журналу", "журналом", "журнале"],
}

# The ultra-hot term (FIXTURES.md: ~60% of docs) and its inflections.
HOT_LEMMA = "ошибка"
_HOT_FORMS = ["ошибка", "ошибки", "ошибке", "ошибку", "ошибкой"]

# --- particles / prepositions / conjunctions (dropped by T3) ---------------
_POS: dict[str, list[str]] = {
    "и": ["СОЮЗ"],
    "в": ["ПРЕДЛ"],
    "на": ["ПРЕДЛ"],
    "но": ["СОЮЗ"],
    "ах": ["МЕЖД"],
    "ой": ["МЕЖД"],
    "с": ["ПРЕДЛ"],
    "по": ["ПРЕДЛ"],
    "за": ["ПРЕДЛ"],
    "к": ["ПРЕДЛ"],
    "от": ["ПРЕДЛ"],
    "о": ["ПРЕДЛ", "МЕЖД"],
    "у": ["ПРЕДЛ"],
    "же": ["СОЮЗ"],
    "или": ["СОЮЗ"],
    "без": ["ПРЕДЛ"],
    "из": ["ПРЕДЛ"],
    "при": ["ПРЕДЛ"],
    "про": ["ПРЕДЛ"],
    "над": ["ПРЕДЛ"],
    # multi-analysis word: noun "под" (hearth) AND preposition — ANY match drops
    "под": ["С", "ПРЕДЛ"],
    # non-drop tags: survive the filter (exercise the ANY-drop-tag logic)
    "уже": ["НАРЕЧ"],
    "очень": ["НАРЕЧ"],
}

# --- latin / agentic tokens (identity lemma; general mode only) ------------
LATIN_TOKENS = [
    "traceback", "timeout", "merge", "retry", "commit", "branch", "rebase",
    "query", "token", "spark", "shuffle", "partition", "executor", "driver",
    "broadcast", "join", "filter", "agg", "parquet", "iceberg", "checkpoint",
    "snapshot", "lemma", "search", "rank", "score", "block", "delta",
    "varint", "wand", "bm25", "topk", "test", "bench", "assert", "panic",
    "null", "byte", "cache", "disk", "network", "thread", "pool", "queue",
    "stack", "heap", "graph", "vector", "float", "string", "batch", "stream",
    "kernel", "socket", "mutex", "latch", "regex", "codec", "bitmap", "trie",
]


def _synthetic_families(n: int = 400) -> dict[str, list[str]]:
    """Seeded pseudo-Russian noun paradigms: lemma=stem, 4 inflections."""
    cons = list("бвгдзклмнпрст")
    vows = list("аеиоу")
    rng = np.random.RandomState(42)
    fams: dict[str, list[str]] = {}
    seen: set[str] = set()
    while len(fams) < n:
        stem = (
            cons[rng.randint(len(cons))] + vows[rng.randint(len(vows))]
            + cons[rng.randint(len(cons))] + vows[rng.randint(len(vows))]
            + cons[rng.randint(len(cons))] + "ц"  # 'ц' marker avoids real-word clashes
        )
        if stem in seen:
            continue
        forms = [stem + s for s in ("а", "у", "ом", "ах")]
        if any(f in seen for f in forms):
            continue
        seen.add(stem)
        seen.update(forms)
        fams[stem] = forms
    return fams


def build_dictionaries() -> tuple[dict[str, str], dict[str, list[str]], list[str]]:
    """Returns (word→lemma, word→tags, zipf_ranked_forms).

    zipf_ranked_forms: the Russian content-word forms in their fixed Zipf
    rank order (seeded shuffle so families don't sit adjacent in rank space).
    The hot-term forms are NOT in the Zipf pool — injected separately at 60%.
    """
    lemma_of: dict[str, str] = {}
    for lemma, forms in {**_REAL_FAMILIES, **_synthetic_families()}.items():
        lemma_of[lemma] = lemma
        for f in forms:
            assert f not in lemma_of, f"form collision: {f}"
            lemma_of[f] = lemma
    for f in _HOT_FORMS:
        lemma_of[f] = HOT_LEMMA
    for w in _POS:  # particles still have lemmas (identity) — drop happens via POS
        lemma_of.setdefault(w, w)
    for w in LATIN_TOKENS:
        lemma_of[w] = w

    pool = sorted(w for w in lemma_of if w not in _POS and w not in LATIN_TOKENS and lemma_of[w] != HOT_LEMMA)
    order = np.random.RandomState(42).permutation(len(pool))
    ranked = [pool[i] for i in order]
    # particles get sprinkled into text too (they must be there to be dropped)
    return lemma_of, dict(_POS), ranked


LEMMA_OF, POS_OF, ZIPF_FORMS = build_dictionaries()
PARTICLES = sorted(_POS)
STOP_WORDS = frozenset(w for w, tags in POS_OF.items() if DROP_TAGS & set(tags))
