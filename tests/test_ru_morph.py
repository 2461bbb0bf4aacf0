"""Expanded Russian dictionary (resources/ru_morph.py): coverage on held-out
real-ish text + engine integration through the named-dictionary registry.

The r1 fixture dictionary dropped every OOV Russian word in ref_compat mode
(reference semantics: no normal form → skip, Lemmatizator.java:47-52) —
recall collapsed on real text. The paradigm-generated map must keep the OOV
drop rate under 2% on text it was not built from (VERDICT r4 #7
tightened the r3 5% bound).
"""

from __future__ import annotations

import re

from searchengine_spark.functions.analysis import analyze_text, get_dictionary
from searchengine_spark.resources.ru_morph import RU_LEMMA_OF, RU_STOP_WORDS

# Held-out sample: ordinary Russian tech-support / assistant dialogue turns,
# written independently of the lemma lists (е-spelling, matching the
# reference's [^а-я] charset that splits on ё).
HELD_OUT = """
пользователь сообщил что система не отвечает на запросы после обновления
мы проверили журналы сервера и нашли несколько ошибок в конфигурации
попробуйте перезапустить службу и очистить кеш браузера
после перезагрузки проблема исчезла но скорость работы осталась низкой
инженер предложил увеличить объем памяти и настроить балансировку нагрузки
клиент хочет получить отчет о состоянии базы данных за последнюю неделю
резервное копирование выполняется каждую ночь в автоматическом режиме
новая версия программы содержит исправления и улучшения производительности
для доступа к панели управления введите имя пользователя и пароль
разработчики добавили возможность поиска по содержанию документов
если ошибка повторится пришлите нам файл с подробным описанием проблемы
встреча команды состоится завтра утром в большом зале на втором этаже
он долго искал причину сбоя и нашел ее в старом модуле обработки данных
результаты тестирования показали что новый метод работает быстрее старого
она написала подробную инструкцию по установке и настройке приложения
добрый день подскажите пожалуйста как восстановить удаленные файлы из корзины
к сожалению это невозможно без резервной копии проверьте настройки архива
вчера вечером мы заметили странное поведение программы при открытии больших таблиц
техническая поддержка ответила быстро и предложила временное решение проблемы
согласно документации эта функция доступна только в новой версии продукта
руководитель отдела попросил подготовить презентацию к следующей встрече
в течение дня специалисты проверили все серверы и обновили операционные системы
отчет содержал подробный анализ ошибок за прошлый месяц и план их устранения
чтобы ускорить работу приложения рекомендуется закрыть лишние программы
обучение новых сотрудников начнется в понедельник в девять часов утра
утром я открыл почту и увидел письмо от старого друга из другого города
он рассказал о своей новой работе и пригласил меня приехать в гости летом
мы давно не виделись поэтому я сразу согласился и начал планировать поездку
вечером мы долго говорили по телефону о жизни о семье и о планах на будущее
дети быстро растут и уже ходят в школу а старший сын учится в университете
погода в последние дни была холодная шел дождь и дул сильный ветер
в магазине рядом с домом можно купить свежий хлеб молоко и овощи
после ужина вся семья собралась в большой комнате и смотрела старый фильм
администратор пригласил коллег обсудить план перехода на новое оборудование
перед выпуском обновления команда проводит полное тестирование всех модулей
заказчик попросил добавить в отчет графики по продажам за каждый квартал
бухгалтерия напомнила сотрудникам сдать документы до конца рабочей недели
на конференции выступали специалисты из разных стран и делились опытом
студенты готовились к экзамену всю неделю и повторяли сложные темы
врач посоветовал больше гулять на свежем воздухе и меньше сидеть за компьютером
поезд отправляется с третьего пути через пятнадцать минут после объявления
осенью листья желтеют и падают а птицы улетают в теплые края
повар приготовил вкусный суп из свежих овощей и подал его с хлебом
мастер быстро починил сломанную дверь и проверил замок несколько раз
библиотека работает ежедневно кроме воскресенья с девяти часов до восьми вечера
""".strip()


def _tokens(text: str) -> list[str]:
    cleaned = re.sub(r"[^а-я\s]", " ", text.lower())
    return [w for w in cleaned.split() if w]


def test_oov_drop_rate_under_2_percent():
    lemma_of, stop = get_dictionary("ru_full")
    toks = _tokens(HELD_OUT)
    content = [w for w in toks if w not in stop]
    assert len(content) > 100  # the sample is big enough to mean something
    oov = [w for w in content if w not in lemma_of]
    rate = len(oov) / len(content)
    assert rate < 0.02, f"OOV drop rate {rate:.1%}: {sorted(set(oov))}"


def test_paradigms_map_to_first_normal_form():
    # noun declension, adjective agreement, verb conjugation, irregulars
    assert RU_LEMMA_OF["запросы"] == "запрос"
    assert RU_LEMMA_OF["системе"] == "система"
    assert RU_LEMMA_OF["ошибках"] == "ошибка"
    assert RU_LEMMA_OF["новая"] == "новый"
    assert RU_LEMMA_OF["работает"] == "работать"
    assert RU_LEMMA_OF["нашел"] == "найти"
    assert RU_LEMMA_OF["может"] == "мочь"
    assert RU_LEMMA_OF["меня"] == "я"


def test_stop_words_are_closed_classes():
    for w in ("в", "на", "и", "но", "не", "же", "под", "через", "хотя"):
        assert w in RU_STOP_WORDS


def test_fixture_parity_preserved():
    """Merged map must not change any fixture mapping (golden-model parity)."""
    from searchengine_spark.resources.vocab import LEMMA_OF
    merged, _ = get_dictionary("ru_full")
    for w, lem in LEMMA_OF.items():
        assert merged[w] == lem


def test_analyze_text_with_ru_full():
    out = analyze_text("мы нашли ошибки в журналах сервера",
                       mode="ref_compat", dictionary="ru_full")
    assert out == ["мы", "найти", "ошибка", "журнал", "сервер"]


def test_index_and_search_with_ru_full(spark):
    """End-to-end: build with dictionary='ru_full', query with an inflected
    form the FIXTURE dictionary does not know — must still match."""
    from searchengine_spark.operators.indexer import build_index
    from searchengine_spark.operators.search import search
    rows = [
        ("c1", 0, "user", "инженер проверял журналы сервера", None, "2026-01-01 00:00:00"),
        ("c1", 1, "assistant", "в журнале сервера нашлись ошибки", None, "2026-01-01 00:01:00"),
        ("c2", 0, "user", "совсем другая тема про отчеты", None, "2026-01-01 00:02:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", df_ts())
    idx = build_index(df, mode="ref_compat", bucket_range=256, block_size=32,
                      dictionary="ru_full")
    assert idx["dictionary"] == "ru_full"
    # query uses an inflected form ("журналах") unseen verbatim in the docs
    hits = search(idx, "журналах сервера", k=5, mode="ref_compat").collect()
    got = {(r["conv_id"], r["turn_idx"]) for r in hits}
    assert got == {("c1", 0), ("c1", 1)}


def df_ts():
    from pyspark.sql import functions as F
    return F.col("ts").cast("timestamp")
