"""Build the frozen word-frequency snapshot used by the J2 hyphenation gate.

The reference gates hyphen merges on ``wordfreq.zipf_frequency(w, 'en') >=
2.5`` (/root/reference/glmocr/postprocess/result_formatter.py:367-368).
`wordfreq` (and any downloadable word list) is unavailable in this
environment, so the snapshot is **derived from public English prose shipped
with the interpreter and installed OSS packages** (CPython stdlib, numpy,
pandas, pyspark — docstrings, comments, docs; ~22M word tokens), overlaid
with a hand-curated everyday-vocabulary core that patches the technical-
domain skew of that corpus (household/social/narrative words that OSS
prose underuses), expanded with conservative regular inflections.

zipf for corpus words = log10(count / total * 1e9) — the standard
"occurrences per billion words" scale wordfreq uses; only words clearing
the 2.5 gate are kept (that's the sole use downstream). Curated words get
band values (4.0 lemma / 3.4 inflected) — the gate is membership, exact
values are irrelevant above 2.5.

The OUTPUT file (glm_ocr_spark/wordfreq_snapshot_data.txt) is the frozen,
versioned artifact; this script records provenance and makes the freeze
reproducible in the same environment. Determinism: pure counting + sorted
output, no RNG.

Run:  python tools/build_wordfreq_snapshot.py
"""

from __future__ import annotations

import collections
import math
import os
import re

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "glm_ocr_spark", "wordfreq_snapshot_data.txt")

# split identifiers on case boundaries ("currentFactor" -> current, factor)
# instead of lowercasing whole blobs
WORD_RE = re.compile(r"[A-Z]?[a-z]+")
VOWEL_RE = re.compile(r"[aeiouy]")
TRIPLE_RE = re.compile(r"(.)\1\1")
# "aabb..."-style doctest patterns: no English word starts XXYY
DOUBLE_DOUBLE_RE = re.compile(r"^(.)\1(.)\2")
MIN_ZIPF = 2.5

# len>=3 tokens drawn from <=2 distinct letters are nearly always test
# identifiers ("aab", "abab"), not words — except these real ones.
LOW_VARIETY_OK = {"dad", "mum", "mom", "eye", "ebb", "add", "egg", "inn",
                  "odd", "off", "too", "see", "bee", "boo", "zoo", "coo",
                  "moo", "aha", "noon", "deed", "peep", "toot", "sees",
                  "mama", "papa", "dada", "anna"}


def is_junk(w: str) -> bool:
    if not VOWEL_RE.search(w) or TRIPLE_RE.search(w):
        return True
    if DOUBLE_DOUBLE_RE.match(w):
        return True
    return len(set(w)) <= 2 and w not in LOW_VARIETY_OK

# ---------------------------------------------------------------- curated
# Everyday-English core: common lemmas the OSS-prose corpus under-represents
# (domestic, social, narrative, body, food, nature, emotion vocabulary).
# All are unambiguously common words (wordfreq zipf well above 2.5).
CURATED = """
about above across act action afraid afternoon again against age ago agree
air airport almost alone along already although always amount angry animal
another answer anybody anyone anything anywhere apartment appear apple arm
army around arrive art article artist ask asleep attack aunt autumn awake
away baby back bad bag ball banana bank bath bathroom beach bear beard
beautiful beauty because become bed bedroom beer begin behind believe bell
belong below belt bench beside best better between bicycle big bird birth
birthday bite bitter black blanket blood blue boat body boil bone book boot
born borrow boss both bottle bottom box boy brain branch brave bread break
breakfast breath breathe brick bridge bright bring brother brown brush build
burn bus busy butter buy cake call calm camera camp can candle cap car card
care careful carry cat catch ceiling chair chance change cheap cheese chest
chicken child children chocolate choose church cinema circle city class
clean clear clever climb clock close cloth clothes cloud coast coat coffee
cold collect college colour comb come comfortable company compare complain
cook cool copy corner cost cotton cough count country course cousin cover
cow crazy cream cross crowd cry cup cupboard curtain cut dad dance danger
dangerous dark date daughter day dead dear death decide deep deer desk
dictionary die different difficult dinner dirty dish doctor dog door double
down draw dream dress drink drive drop dry duck during dust duty each ear
early earn earth east easy eat egg eight either elephant eleven else empty
end enemy enjoy enough enter evening ever every everybody everyone
everything everywhere exact exam excellent except excite excuse expensive
explain eye face factory fail fall family famous far farm fast fat father
fault favourite fear feed feel fence festival fetch fever few field fight
fill film find fine finger finish fire first fish five flag flat floor
flower fly fog food foot football forest forget forgive fork four fox free
fresh friend friendly frighten frog front fruit fry full fun funny future
game garden gate gather gentle gentleman get gift girl give glad glass go
goat gold good goodbye grandfather grandmother grass great green grey ground
group grow guess guest guitar gun hair half hall hand handsome hang happen
happy hard hat hate have head health healthy hear heart heavy hello help hen
her here hers herself hide high hill him himself his history hit hold hole
holiday home honest hope horse hospital hot hotel hour house how hundred
hungry hunt hurry hurt husband ice idea if ill imagine immediately
important in inside instead interest interesting invite iron island it its
itself jacket jam job join joke journey joy juice jump just keep key kick
kid kill kind king kiss kitchen knee knife knock know lady lake lamp land
large last late laugh lazy lead leaf learn least leave left leg lemon lend
less lesson let letter library lie life lift light like line lion lip
listen little live lonely long look lose loud love low lucky lunch machine
mad mail main make man many map market marry match matter may maybe meal
mean meat medicine meet member mention menu middle milk million mind minute
mirror miss mistake mix modern moment money monkey month moon more morning
most mother mountain mouse mouth move much mum music must my myself name
narrow nature near nearly neck need neighbour neither nephew nervous never
new news newspaper next nice niece night nine nobody noise noisy none noon
north nose not note nothing notice now number nurse obey ocean of off offer
office often oil old on once one onion only open or orange order other our
ours ourselves out outside over own page pain paint pair pants paper parent
park part party pass past pay peace pear pen pencil people perhaps person
photograph piano pick picture piece pig pink place plane plant plate play
pleasant please pleasure pocket point police polite pool poor popular
possible post potato pour practise present pretty price prince princess
prize probably problem promise proud public pull punish pupil push put
queen question quick quiet quite rabbit race radio rain raise reach read
ready real really reason receive red remember repair repeat reply report
rest restaurant return rice rich ride right ring rise river road rob rock
room rope rose round rubbish rude rule run sad safe sail salad salt same
sand save say school science scissors sea search season seat second secret
see seem sell send sentence seven several shadow shake shall shape share
sharp she sheep shelf shine ship shirt shoe shop short should shoulder
shout show shower shut shy sick side sight sign silence silly silver simple
since sing single sister sit six size skirt sky sleep slow small smell
smile smoke snow so soap sock sofa soft some somebody someone something
sometimes somewhere son song soon sorry sound soup south space speak
special spell spend spoon sport spring square stairs stamp stand star start
station stay steal step still stomach stone stop store storm story strange
street strong student study stupid subject sudden sugar summer sun supper
sure surprise sweet swim table tail take talk tall taste taxi tea teach
team tear telephone television tell ten tennis terrible test than thank
that theatre their theirs them themselves then there these they thick thief
thin thing think third thirsty this those though thousand three through
throw ticket tidy tie tiger till time tired to today toe together toilet
tomato tomorrow tonight too tooth top touch towel town toy train travel
tree trip trouble trousers true trust try turn twelve twenty twice two ugly
umbrella uncle under understand university until up upstairs us use useful
usual vegetable very village visit voice wait wake walk wall want warm wash
watch water way we weak wear weather wedding week weekend welcome well west
wet what wheel when where which while white who whole whose why wide wife
wild will win wind window wine winter wise wish with without woman wonder
wonderful wood word work world worry worse worst would write wrong year
yellow yes yesterday yet you young your yours yourself
government moment movement statement agreement argument treatment
department development environment equipment parliament entertainment
education situation population relation relationship nation national
international organisation organization direction collection connection
election attention invitation celebration conversation decision television
division revision occasion profession discussion expression impression
possession session passion mission permission admission
carefully quickly slowly quietly suddenly finally usually really actually
certainly probably completely exactly especially generally immediately
naturally obviously seriously simply clearly briefly deeply easily happily
heavily luckily angrily hungrily lazily noisily
walked talked looked wanted started worked played stayed waited watched
washed wished helped jumped kicked kissed knocked laughed learned listened
lived loved moved needed opened asked called cleaned climbed closed cooked
counted crossed cried carried danced decided dressed dropped earned ended
enjoyed entered explained failed filled finished followed gathered guessed
happened hated hoped hunted hurried imagined invited joined joked killed
landed lasted lifted liked marched married matched mentioned missed mixed
noticed obeyed offered ordered painted parked passed picked planned planted
pleased pointed practised promised pulled punished pushed rained raised
reached received remembered repaired repeated replied reported rested
returned robbed rolled rubbed ruled rushed sailed saved searched seemed
shared shined shouted showed smelled smiled smoked snowed sounded spelled
stepped stopped stored studied surprised tasted thanked tied touched
travelled trusted tried turned visited waited walked wanted warmed washed
wished wondered worked worried
walking talking looking wanting starting working playing staying waiting
watching washing wishing helping jumping laughing learning listening living
loving moving needing opening asking calling cleaning climbing closing
cooking crying carrying dancing deciding dressing dropping eating enjoying
entering explaining falling feeding feeling fighting filling finding
finishing flying following getting giving going growing guessing happening
hating having hearing helping hiding hitting holding hoping hunting
hurrying imagining inviting joining joking keeping killing kissing knowing
landing leaving lending letting lifting liking losing loving making
marrying meaning meeting mentioning missing mixing noticing offering
opening ordering painting parking passing paying picking planning planting
playing pleasing pointing pouring practising promising pulling punishing
pushing putting raining raising reaching reading receiving remembering
repairing repeating replying reporting resting returning riding ringing
rising robbing rolling rubbing ruling running rushing sailing saving saying
searching seeing seeking selling sending setting shaking sharing shining
shopping shouting showing shutting singing sitting sleeping smelling
smiling smoking snowing sounding speaking spelling spending standing
starting staying stealing stepping stopping storing studying surprising
swimming taking talking tasting teaching telling thanking thinking throwing
touching travelling trusting trying turning visiting waiting waking walking
wanting warming washing watching wearing wedding weeping winning wishing
wondering working worrying writing
"""

# Conservative regular inflections applied to curated lemmas (plural /
# 3rd-person -s only; -ed/-ing/-ly forms are hand-listed above instead of
# generated, to avoid minting non-words like "runed").
def plural(w: str) -> str | None:
    if len(w) < 3:
        return None
    if w.endswith(("s", "x", "z", "ch", "sh")):
        return w + "es"
    if w.endswith("y") and w[-2] not in "aeiou":
        return w[:-1] + "ies"
    return w + "s"


def corpus_counts() -> tuple[collections.Counter, collections.Counter, int]:
    import numpy
    import pandas
    import pyspark

    roots = [os.path.dirname(os.__file__)]
    for m in (numpy, pandas, pyspark):
        roots.append(os.path.dirname(m.__file__))
    counts: collections.Counter = collections.Counter()
    docfreq: collections.Counter = collections.Counter()
    for root in roots:
        for dirpath, dirs, files in os.walk(root):
            # test suites are full of synthetic identifier tokens
            # ("aabbcc", fixture soup) — prose quality is much higher
            # without them
            dirs[:] = [d for d in dirs if d not in ("tests", "test")]
            for f in sorted(files):
                if not f.endswith((".py", ".rst", ".txt", ".md")):
                    continue
                if f.startswith("test_") or f.endswith("_test.py"):
                    continue
                try:
                    src = open(os.path.join(dirpath, f), encoding="utf-8",
                               errors="ignore").read()
                except OSError:
                    continue
                ws = [w.lower() for w in WORD_RE.findall(src)
                      if 3 <= len(w) <= 20]
                counts.update(ws)
                docfreq.update(set(ws))
    return counts, docfreq, sum(counts.values())


def main() -> None:
    counts, docfreq, total = corpus_counts()
    table: dict[str, float] = {}
    for w, c in counts.items():
        # df >= 3 files: real words spread across files; generated-code
        # identifier soup concentrates in one or two
        if is_junk(w) or docfreq[w] < 3:
            continue
        zipf = math.log10(c / total * 1e9)
        if zipf >= MIN_ZIPF:
            table[w] = round(zipf, 2)

    for w in CURATED.split():
        table[w] = max(table.get(w, 0.0), 4.0)
        p = plural(w)
        if p:
            table[p] = max(table.get(p, 0.0), 3.4)

    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# frozen wordfreq snapshot v2 — see "
                "tools/build_wordfreq_snapshot.py for provenance\n")
        for w in sorted(table):
            f.write(f"{w} {table[w]}\n")
    print(f"wrote {len(table)} words to {OUT} (corpus tokens: {total})")


if __name__ == "__main__":
    main()
