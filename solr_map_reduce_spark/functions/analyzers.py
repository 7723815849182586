"""Text analyzers — the ``tokenizeText`` surface (SURVEY §2 B4, §7 hard part 2).

The reference runs a Lucene ``Analyzer`` looked up by Solr fieldType name over
an input field, appending each token to a multi-valued output field
(ml/TokenizeTextBuilder.java:83-107).  FieldTypes exercised by its configs/
schemas (minimr/conf/schema.xml): ``text_en`` (StandardTokenizer +
EnglishPossessiveFilter + stop words + PorterStemFilter), ``text_general``
(StandardTokenizer + stop + lowercase), ``lowercase`` (KeywordTokenizer +
lowercase), plus whitespace/keyword primitives.

Spark-first mapping:
- ``lowercase`` / ``whitespace`` / ``keyword`` / ``text_general`` are pure
  builtin-function pipelines (JVM-side, whole-stage-codegen'd, SQL-oracle
  checkable).
- ``text_en`` needs possessive-strip + Porter stemming → Arrow-batched pandas
  UDF.  The Porter stemmer here is a from-scratch implementation of the
  published algorithm (M.F. Porter, 1980 — public domain), matching Lucene's
  PorterStemFilter for regular English words.

Tokenizer approximation: Lucene's StandardTokenizer is UAX#29 word-break; we
approximate with unicode letter/digit runs, which matches it on the
alphanumeric test corpus the reference exercises.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (public constant, 33 words).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

TOKEN_PATTERN = r"[^\p{L}\p{N}]+"  # split on non-letter/digit runs


def _split_tokens(col: Column, lowercase: bool = True) -> Column:
    # strip edge separators THEN split: equivalent to split+filter-empties but
    # stays inside whole-stage codegen (higher-order filter() is interpreted —
    # measured 3.7x slower at sf0.1)
    src = F.lower(col) if lowercase else col
    stripped = F.regexp_replace(src, rf"^{TOKEN_PATTERN}|{TOKEN_PATTERN}$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, TOKEN_PATTERN)
    )


def tokenize_lowercase(col: Column) -> Column:
    """``lowercase`` fieldType: KeywordTokenizer + LowerCaseFilter — one token,
    the whole value lowercased."""
    return F.array(F.lower(col))


def tokenize_keyword(col: Column) -> Column:
    return F.array(col)


def tokenize_whitespace(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, r"\s+")
    )


def tokenize_text_general(col: Column, remove_stopwords: bool = False) -> Column:
    """``text_general``-style: unicode word split + lowercase (+ stop removal).

    Stop removal defaults off so the SQL oracle stays trivially expressible;
    the schema's text_general does apply the (small) stopwords.txt, which is
    empty in the reference's minimr configs.
    """
    toks = _split_tokens(col)
    if remove_stopwords:
        stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
        toks = F.array_except(toks, stops)
    return toks


def porter_stem(word: str) -> str:
    """Porter stemming algorithm (Porter 1980), steps 1a-5b.

    From-scratch implementation of the published algorithm; mirrors Lucene's
    PorterStemFilter behavior for ordinary lowercase English tokens.
    """
    if len(word) <= 2:
        return word

    def is_cons(w: str, i: int) -> bool:
        c = w[i]
        if c in "aeiou":
            return False
        if c == "y":
            return i == 0 or not is_cons(w, i - 1)
        return True

    def measure(stem: str) -> int:
        # number of VC sequences
        m = 0
        i = 0
        n = len(stem)
        while i < n and is_cons(stem, i):
            i += 1
        while i < n:
            while i < n and not is_cons(stem, i):
                i += 1
            if i >= n:
                break
            m += 1
            while i < n and is_cons(stem, i):
                i += 1
        return m

    def has_vowel(stem: str) -> bool:
        return any(not is_cons(stem, i) for i in range(len(stem)))

    def ends_double_cons(w: str) -> bool:
        return len(w) >= 2 and w[-1] == w[-2] and is_cons(w, len(w) - 1)

    def cvc(w: str) -> bool:
        if len(w) < 3:
            return False
        if not (is_cons(w, len(w) - 3) and not is_cons(w, len(w) - 2) and is_cons(w, len(w) - 1)):
            return False
        return w[-1] not in "wxy"

    w = word
    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # Step 1b
    if w.endswith("eed"):
        if measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif measure(w) == 1 and cvc(w):
                w += "e"
    # Step 1c
    if w.endswith("y") and has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # Step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        ("logi", "log"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if measure(stem) > 0:
                w = stem + rep
            break
    # Step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if measure(stem) > 0:
                w = stem + rep
            break
    # Step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                continue
            if measure(stem) > 1:
                w = stem
            break
    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = measure(stem)
        if m > 1 or (m == 1 and not cvc(stem)):
            w = stem
    # Step 5b
    if w.endswith("ll") and measure(w) > 1:
        w = w[:-1]
    return w


def _analyze_en(text: str | None, cache: dict[str, str] | None = None) -> list[str] | None:
    if text is None:
        return None
    import re

    tokens = [t for t in re.split(r"[^\w]+|_", text.lower(), flags=re.UNICODE) if t]
    out = []
    if cache is None:
        cache = {}
    for t in tokens:
        # EnglishPossessiveFilter: strip trailing 's (apostrophes already split)
        if t in ENGLISH_STOP_WORDS:
            continue
        s = cache.get(t)
        if s is None:
            s = porter_stem(t)
            cache[t] = s
        out.append(s)
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def _text_en_udf(texts: pd.Series) -> pd.Series:
    # one stem cache per Arrow batch: token frequency is Zipfian, so the
    # distinct-token set the stemmer actually runs on is a small fraction of
    # the token stream
    cache: dict[str, str] = {}
    return texts.map(lambda t: _analyze_en(t, cache))


def tokenize_text_en(col: Column) -> Column:
    """``text_en`` fieldType: standard-split + lowercase + English stop removal
    + Porter stemming (minimr/conf/schema.xml fieldType text_en)."""
    return _text_en_udf(col)


# ---------------------------------------------------------------------------
# Language-variant analyzers (the reference schema declares ~30 text_<lang>
# fieldTypes — minimr/conf/schema.xml; these two show the registry
# generalizes the same way: per-language stop list + light stemmer).
# Stop lists are from the public Snowball project lists (abridged to the
# high-frequency function words); stemmers are from-scratch implementations
# of Savoy's published MINIMAL stemmers (J. Savoy, CLEF / SIGIR Forum —
# the same algorithms behind Lucene's French/GermanMinimalStemFilter).
# ---------------------------------------------------------------------------

# Snowball French stop list (abridged) + elision remnants: French tokenizes
# l'avion -> [l, avion] under the word-split rule, so the elided articles
# (l', d', j', …) surface as one-letter tokens and must drop like stopwords
# (Lucene uses ElisionFilter for the same purpose).
FRENCH_STOP_WORDS = frozenset(
    """au aux avec ce ces dans de des du elle en et eux il ils je la le les
    leur lui ma mais me même mes moi mon ne nos notre nous on ou où par pas
    pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos votre
    vous c d j l m n s t y été étée étées étés étant était étaient suis es
    est sommes êtes sont sera seront serai seras ai as avons avez ont
    meme ou ete etait etaient etes""".split()
    # last line: ASCII-folded variants for accent-stripped text
)

# Snowball German stop list (abridged).
GERMAN_STOP_WORDS = frozenset(
    """aber alle als also am an auch auf aus bei bin bis bist da damit dann
    das dass daß dein deine dem den der des dessen die dies diese dir doch
    dort du durch ein eine einem einen einer eines er es euer eure für
    hatte hatten hier hinter ich ihr ihre im in ist ja jede jedem jeden
    jeder jedes jener kann kein können mein meine mit muss muß nach nicht
    nichts noch nun nur ob oder ohne sehr sein seine sich sie sind so über
    um und uns unser unter vom von vor wann war waren warum was weiter
    weitere wenn wer werde werden wie wieder will wir wird wirst wo zu zum
    zur fur uber konnen""".split()
    # last entries: ASCII-folded variants for umlaut-stripped text
)


def french_minimal_stem(w: str) -> str:
    """Savoy's minimal French stemmer (plural/gender endings; the
    FrenchMinimalStemFilter algorithm).  Words under 6 letters pass
    through untouched."""
    if len(w) < 6:
        return w
    if w.endswith("x"):
        if w.endswith("aux"):
            return w[:-2] + "l"  # chevaux -> cheval
        return w[:-1]
    if w.endswith("s"):
        w = w[:-1]
    if w.endswith("r"):
        w = w[:-1]
    if w.endswith("e"):
        w = w[:-1]
    if w.endswith("é"):
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2] and w[-1].isalpha():
        w = w[:-1]
    return w


def german_minimal_stem(w: str) -> str:
    """Savoy's minimal German stemmer (declension endings; the
    GermanMinimalStemFilter algorithm)."""
    if len(w) > 5 and w.endswith("nen"):
        return w[:-3]
    if len(w) > 4 and w[-2] == "e" and w[-1] in "nsmr":
        return w[:-2]
    if len(w) > 3 and w[-1] in "nsre":
        return w[:-1]
    return w


# Snowball Spanish stop list (abridged to the high-frequency function words).
SPANISH_STOP_WORDS = frozenset(
    """a al algo ante antes como con contra cual cuando de del desde donde
    durante e el ella ellas ellos en entre era eres es esa esas ese eso esos
    esta estas este esto estos fue ha han hasta hay la las le les lo los mas
    más me mi mis mucho muy nada ni no nos nosotros nuestra nuestro o os otra
    otro para pero poco por porque que quien se sin sobre son su sus también
    tambien te tu tus un una unas uno unos y ya yo""".split()
)

# Snowball Italian stop list (abridged).
ITALIAN_STOP_WORDS = frozenset(
    """a ad agli ai al alla alle allo anche ancora che chi ci come con cui da
    dal dalla dalle dallo degli dei del della delle dello di dove e ed fra gli
    ha hanno ho i il in io la le lei lo loro lui ma mia mie miei mio ne negli
    nei nel nella nelle nello noi non nostra nostre nostri nostro o per perche
    perché più piu quale quando questa queste questi questo se sei si sia
    siamo siete sono su sua sue sugli sui sul sulla sulle sullo suo suoi tra
    tu tua tue tuo tuoi tutti tutto un una uno vi voi vostra vostre vostri
    vostro è""".split()
)


def spanish_minimal_stem(w: str) -> str:
    """Minimal Spanish plural stemmer (Savoy's minimal-stemming approach,
    the SpanishMinimalStemFilter algorithm family): strip plural -s/-es
    and map -ces back to -z; words under 4 letters pass through."""
    if len(w) < 4 or not w.endswith("s"):
        return w
    if w.endswith("ces"):
        return w[:-3] + "z"  # luces -> luz
    if len(w) >= 5 and w.endswith("es") and w[-3] in "rndjlm":
        return w[:-2]  # colores -> color, leones -> leon
    return w[:-1]  # gatos -> gato, casas -> casa


def italian_minimal_stem(w: str) -> str:
    """Minimal Italian stemmer (Savoy's minimal-stemming approach): strip
    one final inflection vowel (plural/gender -i/-e/-o/-a) from words of
    six letters or more; shorter words pass through untouched."""
    if len(w) < 6 or w[-1] not in "iaeo":
        return w
    if w.endswith("ie") or w.endswith("he"):
        return w[:-2]  # amiche -> amich, grigie -> grig
    return w[:-1]  # gatti -> gatt, libri -> libr


def turkish_fold(text: str) -> str:
    """Turkish-aware case fold (Lucene TurkishLowerCaseFilter): dotless
    uppercase ``I`` folds to dotless ``ı`` and dotted ``İ`` to ``i`` —
    the locale-neutral ``str.lower()`` maps ``I``→``i``, which merges
    distinct Turkish words (``KITAP``→``kitap`` instead of ``kıtap``)."""
    return text.replace("İ", "i").replace("I", "ı").lower()


def _analyze_lang(
    text: str | None,
    stops: frozenset,
    stem,
    cache: dict[str, str] | None = None,
    fold=None,
) -> list[str] | None:
    if text is None:
        return None
    import re

    folded = fold(text) if fold is not None else text.lower()
    tokens = [t for t in re.split(r"[^\w]+|_", folded, flags=re.UNICODE) if t]
    out = []
    if cache is None:
        cache = {}
    for t in tokens:
        if t in stops:
            continue
        s = cache.get(t)
        if s is None:
            s = stem(t)
            cache[t] = s
        out.append(s)
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def _text_fr_udf(texts: pd.Series) -> pd.Series:
    cache: dict[str, str] = {}
    return texts.map(
        lambda t: _analyze_lang(t, FRENCH_STOP_WORDS, french_minimal_stem, cache)
    )


@pandas_udf(T.ArrayType(T.StringType()))
def _text_de_udf(texts: pd.Series) -> pd.Series:
    cache: dict[str, str] = {}
    return texts.map(
        lambda t: _analyze_lang(t, GERMAN_STOP_WORDS, german_minimal_stem, cache)
    )


def tokenize_text_fr(col: Column) -> Column:
    """``text_fr``-style: word split + lowercase + elision/stop removal +
    Savoy minimal French stemming."""
    return _text_fr_udf(col)


def tokenize_text_de(col: Column) -> Column:
    """``text_de``-style: word split + lowercase + stop removal + Savoy
    minimal German stemming."""
    return _text_de_udf(col)


@pandas_udf(T.ArrayType(T.StringType()))
def _text_es_udf(texts: pd.Series) -> pd.Series:
    cache: dict[str, str] = {}
    return texts.map(
        lambda t: _analyze_lang(t, SPANISH_STOP_WORDS, spanish_minimal_stem, cache)
    )


@pandas_udf(T.ArrayType(T.StringType()))
def _text_it_udf(texts: pd.Series) -> pd.Series:
    cache: dict[str, str] = {}
    return texts.map(
        lambda t: _analyze_lang(t, ITALIAN_STOP_WORDS, italian_minimal_stem, cache)
    )


def tokenize_text_es(col: Column) -> Column:
    """``text_es``-style: word split + lowercase + stop removal + minimal
    Spanish plural stemming."""
    return _text_es_udf(col)


def tokenize_text_it(col: Column) -> Column:
    """``text_it``-style: word split + lowercase + stop removal + minimal
    Italian stemming."""
    return _text_it_udf(col)


# --- further language variants, built with the registry factory below
# (each really is one stop list + one minimal stemmer — the pattern the
# reference's ~30 declared text_<lang> fieldTypes expand through) -------

# Snowball Portuguese stop list (abridged).
PORTUGUESE_STOP_WORDS = frozenset(
    """a ao aos as às até com como da das de dela dele deles do dos e ela
    elas ele eles em entre era essa essas esse esses esta estas este estes
    eu foi isso isto já lhe mais mas me mesmo meu minha muito na nas não
    nem no nos nós o os ou para pela pelas pelo pelos por qual quando que
    quem se sem ser seu sua são só também te tem um uma você vocês""".split()
)

# Snowball Swedish stop list (abridged).
SWEDISH_STOP_WORDS = frozenset(
    """alla att av blev bli den denna deras dess det detta du där då efter
    ej eller en er ett från för ha hade han hans har hon hur här i icke
    ingen inom inte jag ju kan kunde man med mellan men mig min mot mycket
    ni nu när någon något några och om oss på samma sedan sig sin sina
    sitta själv skulle som så till under upp vad var vara varför varit
    vi vid vilken än är åt över""".split()
)

# Snowball Norwegian stop list (abridged).
NORWEGIAN_STOP_WORDS = frozenset(
    """alle at av bare begge ble da de deg den denne der det dette din
    disse du eller en er et etter for fra ha hadde han hans har hun hva
    hvem hvis hvor i ikke ingen inn jeg kan kom kun kunne man med meg
    mellom men mer min mot må ned noe noen nå og også om opp oss over på
    seg selv sin sine sitt skal skulle som så til ut var ved vi vil
    ville vår være vært""".split()
)


def portuguese_minimal_stem(w: str) -> str:
    """Minimal Portuguese plural stemmer (Savoy's minimal-stemming
    approach, the PortugueseMinimalStemFilter algorithm family): undo the
    regular plural transformations; words under 4 letters pass through."""
    if len(w) < 4 or not w.endswith("s"):
        return w
    if w.endswith("ões") or w.endswith("ães"):
        return w[:-3] + "ão"  # limões -> limão, pães -> pão
    if w.endswith("ais"):
        return w[:-2] + "l"  # animais -> animal
    if w.endswith("éis"):
        return w[:-3] + "el"  # papéis -> papel
    if w.endswith("ns"):
        return w[:-2] + "m"  # bens -> bem
    if w.endswith("zes") or w.endswith("res"):
        return w[:-2]  # luzes -> luz, flores -> flor
    if len(w) >= 2 and w[-2] in "aeiou":
        return w[:-1]  # gatos -> gato, casas -> casa
    return w


def swedish_minimal_stem(w: str) -> str:
    """Minimal Swedish stemmer (Savoy's light-stemming approach): strip
    the regular plural/definite suffixes, longest first."""
    if len(w) < 5:
        return w
    for suf in ("heterna", "heten", "orna", "erna", "arna"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    for suf in ("ande", "arne", "aste", "orn", "ar", "er", "or", "en",
                "et", "na", "a", "e"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


# Snowball Danish stop list (abridged).
DANISH_STOP_WORDS = frozenset(
    """af alle alt anden at blev blive bliver da de dem den denne der deres
    det dette dig din disse dog du efter eller en end er et for fra ham han
    hans har havde have hende hendes her hos hun hvad hvis hvor i ikke ind
    jeg jer jo kunne man mange med meget men mig min mine mit mod ned noget
    nogle nu når og også om op os over på selv sig sin sine sit skal skulle
    som sådan thi til ud under var vi vil ville vor være været""".split()
)


def _strip_suffixes(w: str, suffixes, min_word: int = 5, min_stem: int = 3) -> str:
    """Shared minimal-stemming strip loop (longest suffix first wins):
    the whole Scandinavian family differs only in its suffix tuple."""
    if len(w) < min_word:
        return w
    for suf in suffixes:
        if w.endswith(suf) and len(w) - len(suf) >= min_stem:
            return w[: -len(suf)]
    return w


def danish_minimal_stem(w: str) -> str:
    """Minimal Danish stemmer (the same published minimal-stemming family
    as Norwegian): strip the regular plural/definite noun endings."""
    return _strip_suffixes(w, ("erne", "ene", "er", "en", "et", "e"))


def norwegian_minimal_stem(w: str) -> str:
    """Minimal Norwegian stemmer (the NorwegianMinimalStemFilter
    algorithm family): strip the regular plural/definite noun endings."""
    return _strip_suffixes(w, ("ene", "ane", "er", "en", "et", "a", "e"))


# Snowball Dutch stop list (abridged).
DUTCH_STOP_WORDS = frozenset(
    """aan al alles als altijd andere ben bij daar dan dat de der deze die
    dit doch doen door dus een eens en er ge geen geweest haar had heb
    hebben heeft hem het hier hij hoe hun iemand iets ik in is ja je kan
    kon kunnen maar me meer men met mij mijn moet na naar niet niets nog
    nu of om omdat ons ook op over reeds te tegen toch toen tot u uit uw
    van veel voor want waren was wat werd wezen wie wil worden wordt zal
    ze zelf zich zij zijn zo zonder zou""".split()
)

# Snowball Finnish stop list (abridged).
FINNISH_STOP_WORDS = frozenset(
    """ei eivät emme en et ette että he hän ja jo joka jos jotka kanssa
    kuin kun me mikä minä mitä mutta myös ne niin nyt ole oli olla on
    ovat se sekä sinä tai te tämä tässä vaan vain vielä voi""".split()
)


def dutch_minimal_stem(w: str) -> str:
    """Minimal Dutch stemmer (the same published light-stemming family):
    undo regular plural forms; ``-heden`` restores ``-heid``."""
    if len(w) >= 8 and w.endswith("heden"):
        return w[:-5] + "heid"  # mogelijkheden -> mogelijkheid
    return _strip_suffixes(w, ("eren", "en", "se", "s", "e"))


# Snowball Russian stop list (abridged).
RUSSIAN_STOP_WORDS = frozenset(
    """а без будет будто бы был была были было быть в вам вас вдруг ведь
    во вот вы г где да даже для до его ее ей ему если есть еще ж же за
    зачем и из или им иногда их к как кто ли лучше меня мне много может
    можно мой мы на над надо наконец нас не него нее ней нет ни нибудь
    никогда ним них ничего но ну о об он она они опять от перед по под
    после потом потому при про раз разве с сам свою себе себя сказать со
    так такой там тебя тем теперь то тогда того тоже только том ты у уж
    уже хоть чего чем через что чтоб чтобы чуть эти этого этой этом этот
    эту я""".split()
)

# Lucene/Snowball Romanian stop list (abridged; modern comma-below
# diacritics ș/ț, with the legacy cedilla forms ş/ţ included too since
# both encodings appear in real Romanian text).
ROMANIAN_STOP_WORDS = frozenset(
    """acea această aceste acestui acel acest al ale am ar are aș aş au
    că care ce cel ci cine cu cum da dacă dar de despre din după ea ei
    el ele era este eu fără fi fie fost iar în înainte între își îşi la
    le lor lui mai mea mele mult nu o ori pe pentru prin sa sale sau se
    și şi sunt tot toate un una unde unei unui vă voi""".split()
)

# Hungarian stop list (abridged, the Snowball/Lucene set).
HUNGARIAN_STOP_WORDS = frozenset(
    """a az ahogy ahol aki akik akkor alatt általában amely amelyek ami
    amikor amit annak arra arról át azok azon azt azzal azért be belül
    benne cikk csak de e ebben egy egyes egyetlen egyik egyre ekkor el
    ellen elő először előtt én éppen ez ezek ezen ezt ezzel fel felé
    hanem hogy hogyan igen így ill illetve ilyen ilyenkor is itt jó jól
    kell kellett keresztül ki kívül között közül le lehet lenne lenni
    lesz lett maga más másik meg még mely melyek mert mi mint mintha
    mit mivel most nagy nagyobb nagyon ne nekem neki nem néha nincs
    olyan ott össze ő ők őket pedig rá s saját sem semmi sok sokat
    sokkal számára szemben szerint szinte talán tehát teljes tovább
    továbbá több úgy ugyanis új újabb újra után utána utolsó vagy vagyis
    valaki valami valamint való van vannak volt voltak voltam voltunk
    vissza vele viszont volna""".split()
)

# Lucene/Snowball Turkish stop list (abridged).
TURKISH_STOP_WORDS = frozenset(
    """acaba altı ama ancak artık aslında az bana bazı belki ben benden
    beni benim beri beş bile bin bir biri birkaç birşey biz bize bizden
    bizi bizim böyle böylece bu buna bunda bundan bunlar bunları bunun
    burada çok çünkü da daha de defa değil diğer diye dokuz dolayı dört
    eğer en gibi hem hep hepsi her hiç için iki ile ilgili ise işte
    kadar katrilyon kez ki kim kimden kime kimi mı mi mu mü nasıl ne
    neden nedenle nerde nerede nereye niçin niye on ona ondan onlar
    onlardan onları onların onu onun orada öyle pek sanki sekiz seksen
    sen senden seni senin siz sizden sizi sizin şey şeyden şeyi şeyler
    şöyle şu şuna şunda şundan şunları şunu tüm ve veya ya yani yedi
    yerine yetmiş yine yirmi yoksa zaten""".split()
)


def russian_light_stem(w: str) -> str:
    """LIGHT Russian stemmer (the published RussianLightStemFilter
    family): strip the regular adjective/noun case endings, longest
    first — a conservative subset that conflates the common surface
    forms without full Snowball morphology."""
    return _strip_suffixes(
        w,
        ("иями", "ями", "ами", "иях", "ьях", "ях", "ах", "ием", "нем",
         "ого", "его", "ому", "ему", "ыми", "ими", "ией", "ей", "ый",
         "ий", "ой", "ая", "яя", "ую", "юю", "ем", "ам", "ом", "ов",
         "ев", "ие", "ье", "ия", "ья", "и", "ы", "а", "я", "о", "у",
         "е", "ь", "ю", "й"),
        min_word=5, min_stem=3,
    )


def romanian_minimal_stem(w: str) -> str:
    """Minimal Romanian stemmer (light-stemming family): strip the
    regular plural / definite-article endings."""
    return _strip_suffixes(
        w,
        ("urilor", "ilor", "elor", "ului", "uri", "ile", "ele", "ii",
         "ul", "ei", "le", "ea", "i", "e", "a"),
        min_word=5, min_stem=3,
    )


def hungarian_light_stem(w: str) -> str:
    """LIGHT Hungarian stemmer: strip the most regular case endings
    (inessive/dative/instrumental/sublative/etc.) then plural/accusative
    — conservative, vowel-harmony pairs listed explicitly."""
    w = _strip_suffixes(
        w,
        ("ban", "ben", "nak", "nek", "val", "vel", "tól", "től", "ból",
         "ből", "hoz", "hez", "höz", "ról", "ről", "ra", "re", "ig"),
        min_word=5, min_stem=3,
    )
    return _strip_suffixes(
        w, ("ok", "ek", "ök", "ak", "at", "et", "ot", "öt", "t", "k"),
        min_word=5, min_stem=3,
    )


def turkish_minimal_stem(w: str) -> str:
    """Minimal Turkish stemmer: strip the regular plural and the
    plural+possessive endings (agglutinative long tail left intact —
    deliberately conservative)."""
    # min_stem 2: Turkish has common 2-letter noun roots (ev, su, el)
    return _strip_suffixes(
        w, ("ları", "leri", "lar", "ler"), min_word=4, min_stem=2
    )


def finnish_minimal_stem(w: str) -> str:
    """LIGHT Finnish stemmer: strip the most regular case endings
    (inessive/elative/adessive/ablative/allative/translative, plural
    variants, genitive/partitive -n/-a).  Finnish is agglutinative, so a
    minimal stemmer is deliberately conservative — it conflates the
    common surface forms without attempting full morphology."""
    w = _strip_suffixes(
        w,
        ("issa", "issä", "ista", "istä", "illa", "illä", "ilta", "iltä",
         "ille", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
         "lle", "ksi"),
        min_word=6, min_stem=4,
    )
    return _strip_suffixes(w, ("en", "in", "an", "än", "a", "ä", "n", "t"),
                           min_word=6, min_stem=4)


ANALYZERS = {
    "keyword": tokenize_keyword,
    "lowercase": tokenize_lowercase,
    "whitespace": tokenize_whitespace,
    "text_general": tokenize_text_general,
    "text_en": tokenize_text_en,
    "text_fr": tokenize_text_fr,
    "text_de": tokenize_text_de,
    "text_es": tokenize_text_es,
    "text_it": tokenize_text_it,
}


def _py_text_general(text: str | None) -> list[str] | None:
    if text is None:
        return None
    import re

    return [t for t in re.split(r"[^\w]+|_", text.lower(), flags=re.UNICODE) if t]


def _py_whitespace(text: str | None) -> list[str] | None:
    if text is None:
        return None
    return text.split()


# Driver-side row kernels, one per analyzer: SearchIndex.analyze_terms runs
# these in-process over the handful of query terms instead of launching a
# Spark job (the |terms|-row createDataFrame + UDF + collect cost ~100 ms on
# the serving hot path).  Each MUST tokenize identically to its Column twin
# above — parity-tested in tests/test_analyzers.py.
PY_ANALYZERS = {
    # F.array(col) wraps a NULL value as [None] — mirror it exactly
    "keyword": lambda t: [t],
    "lowercase": lambda t: [t.lower() if t is not None else None],
    "whitespace": _py_whitespace,
    "text_general": _py_text_general,
    "text_en": _analyze_en,
    "text_fr": lambda t: _analyze_lang(t, FRENCH_STOP_WORDS, french_minimal_stem),
    "text_de": lambda t: _analyze_lang(t, GERMAN_STOP_WORDS, german_minimal_stem),
    "text_es": lambda t: _analyze_lang(t, SPANISH_STOP_WORDS, spanish_minimal_stem),
    "text_it": lambda t: _analyze_lang(t, ITALIAN_STOP_WORDS, italian_minimal_stem),
}


def make_language_analyzer(stop_words, stem, fold=None):
    """Analyzer factory for further ``text_<lang>`` fieldTypes: lowercase
    word-split + stop removal + the given stemmer (any picklable
    ``str -> str``), Arrow-batched like the built-ins.  The reference
    schema declares ~30 language variants (minimr/conf/schema.xml); with
    this each is one line: a stop set and a stemmer.  ``fold`` replaces
    the locale-neutral ``str.lower()`` for languages whose case mapping
    diverges (Turkish dotted/dotless I → :func:`turkish_fold`, matching
    Lucene's TurkishLowerCaseFilter).  The returned analyzer carries a
    ``py_kernel`` attribute (the same tokenization as a plain Python
    callable) so query-term analysis stays driver-side."""
    stops = frozenset(stop_words)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        cache: dict[str, str] = {}
        return texts.map(lambda t: _analyze_lang(t, stops, stem, cache, fold))

    def analyzer(col: Column) -> Column:
        return _udf(col)

    analyzer.py_kernel = lambda t: _analyze_lang(t, stops, stem, fold=fold)
    return analyzer


# pt/sv/no/da ship as factory-built built-ins — each IS the advertised
# one-liner (stop list + minimal stemmer), exercising the same path a
# user's register_text_analyzer call takes
tokenize_text_pt = make_language_analyzer(PORTUGUESE_STOP_WORDS, portuguese_minimal_stem)
tokenize_text_sv = make_language_analyzer(SWEDISH_STOP_WORDS, swedish_minimal_stem)
tokenize_text_no = make_language_analyzer(NORWEGIAN_STOP_WORDS, norwegian_minimal_stem)
tokenize_text_da = make_language_analyzer(DANISH_STOP_WORDS, danish_minimal_stem)
tokenize_text_nl = make_language_analyzer(DUTCH_STOP_WORDS, dutch_minimal_stem)
tokenize_text_fi = make_language_analyzer(FINNISH_STOP_WORDS, finnish_minimal_stem)
tokenize_text_ru = make_language_analyzer(RUSSIAN_STOP_WORDS, russian_light_stem)
tokenize_text_ro = make_language_analyzer(ROMANIAN_STOP_WORDS, romanian_minimal_stem)
tokenize_text_hu = make_language_analyzer(HUNGARIAN_STOP_WORDS, hungarian_light_stem)
tokenize_text_tr = make_language_analyzer(
    TURKISH_STOP_WORDS, turkish_minimal_stem, fold=turkish_fold
)
for _name, _fn in (
    ("text_pt", tokenize_text_pt),
    ("text_sv", tokenize_text_sv),
    ("text_no", tokenize_text_no),
    ("text_da", tokenize_text_da),
    ("text_nl", tokenize_text_nl),
    ("text_fi", tokenize_text_fi),
    ("text_ru", tokenize_text_ru),
    ("text_ro", tokenize_text_ro),
    ("text_hu", tokenize_text_hu),
    ("text_tr", tokenize_text_tr),
):
    ANALYZERS[_name] = _fn
    PY_ANALYZERS[_name] = _fn.py_kernel


def register_text_analyzer(name: str, fn) -> None:
    """Register a custom analyzed fieldType end to end: usable as a schema
    field type (string-valued), analyzed at index time with the token
    array stored (``<field>__tokens``), and applied to query terms by
    ``SearchIndex.analyze_terms`` — exactly how the built-in text_* types
    behave.  When ``fn`` carries a ``py_kernel`` attribute
    (:func:`make_language_analyzer` sets one), query-term analysis runs
    driver-side; otherwise ``analyze_terms`` falls back to a Spark job.

        register_text_analyzer(
            "text_es", make_language_analyzer(SPANISH_STOPS, spanish_stem))
    """
    from solr_map_reduce_spark import indexing, schema

    ANALYZERS[name] = fn
    py = getattr(fn, "py_kernel", None)
    if py is not None:
        PY_ANALYZERS[name] = py
    if name not in indexing.ANALYZED_TYPES:
        indexing.ANALYZED_TYPES = tuple(indexing.ANALYZED_TYPES) + (name,)
    schema._TYPE_ALIASES.setdefault(name, schema.T.StringType())


def tokenize_text(df, input_field: str, output_field: str, analyzer: str = "text_general"):
    """DataFrame-level tokenizeText: append token array column (B4)."""
    try:
        fn = ANALYZERS[analyzer]
    except KeyError:
        raise ValueError(f"unknown analyzer {analyzer!r}; one of {sorted(ANALYZERS)}")
    return df.withColumn(output_field, fn(F.col(input_field)))
