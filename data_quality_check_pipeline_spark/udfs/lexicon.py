"""Per-language word inventories (public common-word lists) shared by:

* the synthetic corpus generator (`synth.py`) — transcripts are sampled
  from these inventories,
* the langid / perplexity model builders (`langid.py`, `perplexity.py`),
* the pure-Python oracle (`oracle.py`).

Everything downstream is deterministic given these lists + fixed seeds.
"""

from __future__ import annotations

LANGS = ["en", "fr", "de", "es", "it"]

WORDS: dict[str, list[str]] = {
    "en": (
        "the of and to in is was for that with his they at this from have "
        "had not but what all were when there can said each which she how "
        "their will other about out many then them these would like him "
        "into time has look two more write see number way could people my "
        "than water been called who its now find long down day did get "
        "come made may part over new sound take only little work know "
        "place years live back give most very after things our just name "
        "good sentence man think say great where help through much before "
        "line right too means old any same tell boy follow came want show"
    ).split(),
    "fr": (
        "le la les de des du et un une dans est pour que qui sur avec ne "
        "pas se au par il elle nous vous ils mais ou donc car si leur tout "
        "plus sans sous entre apres avant chez cette ces son ses mon mes "
        "ton notre votre deux trois quand comme bien encore toujours "
        "jamais ici ainsi alors chaque quelques pendant contre depuis vers "
        "chose monde temps jour annee homme femme enfant pays ville eau "
        "grand petit nouveau premier dernier autre meme faire dire voir "
        "savoir pouvoir vouloir venir devoir prendre donner trouver parler"
    ).split(),
    "de": (
        "der die das und ist in den von zu mit sich des auf fur nicht als "
        "auch es an werden aus er hat dass sie nach wird bei einer um am "
        "sind noch wie einem uber einen so zum war haben nur oder aber vor "
        "zur bis mehr durch man sein wurde sei beim hatte kann gegen vom "
        "konnen schon wenn habe seine ihre dann unter wir soll ich jahr "
        "zwei diese wieder keine uhr seiner worden will zwischen immer "
        "millionen welt heute leben wasser stadt land kind frau mann tag"
    ).split(),
    "es": (
        "el la los las de del y a en que es por un una con no se su para "
        "como mas pero sus le ya o este si porque esta entre cuando muy "
        "sin sobre tambien me hasta hay donde quien desde todo nos "
        "durante todos uno les ni contra otros ese eso ante ellos e esto "
        "mi antes algunos que unos yo otro otras otra tanto esa estos "
        "mucho quienes nada muchos cual poco ella estar estas algunas "
        "algo nosotros mundo tiempo ano dia casa vida hombre mujer agua"
    ).split(),
    "it": (
        "il lo la i gli le di a da in con su per tra fra un uno una e che "
        "non si del della dei delle al alla ai alle nel nella sono era "
        "come piu anche ancora quando dove chi cui questo questa questi "
        "queste quello quella ma o se perche mentre dopo prima contro "
        "senza sotto sopra ogni tutto tutti molto poco tanto altro altra "
        "essere avere fare dire andare vedere sapere volere potere dovere "
        "mondo tempo anno giorno casa vita uomo donna acqua citta paese"
    ).split(),
}
