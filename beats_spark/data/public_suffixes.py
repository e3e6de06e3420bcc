"""Bundled public-suffix snapshot for the registered_domain processor.

The reference resolves eTLD+1 through golang.org/x/net/publicsuffix (an
embedded copy of the Mozilla Public Suffix List; reference:
/root/reference/libbeat/processors/registered_domain/registered_domain.go:93).
This module bundles a static SNAPSHOT SUBSET of that public list — the full
ICANN TLD set plus the widely used second/third-level registry suffixes and
common private hosting suffixes. Unlisted TLDs degrade exactly per the PSL
algorithm's default rule `*` (the last label is treated as the suffix), so
lookups never fail — rare registry SLDs simply resolve one label short.

Callers needing the complete list pass their own rules to
operators.network.registered_domain(suffixes=...) — the operator compiles
whatever rule set it is given; nothing here is baked into the plan shape.

Rule grammar (same as the PSL): plain entries match exactly; WILDCARDS is
the set of parents X for rules `*.X`; EXCEPTIONS is the set of domains D for
rules `!D` (D is NOT a suffix; its parent is).
"""

from __future__ import annotations

# fmt: off
_GENERIC = """
com net org edu gov mil int info biz name pro aero asia cat coop jobs mobi
museum post tel travel xxx app dev page io ai co me tv cc ws fm am gg im ly
sh to gd gs ms nu online site tech store blog cloud xyz top club shop art
link live news media agency digital email group life world today space
website design studio zone fun plus cafe run codes systems network solutions
services company expert tools center works capital city deals direct
directory education energy engineering enterprises equipment estate events
exchange exposed finance financial fitness flights florist foundation fund
gallery gifts glass global graphics guide guru health hosting house
institute insure international investments kitchen land lease legal lighting
limited management marketing money partners parts photography photos pics
pictures productions properties recipes rentals repair report restaurant
reviews school software support surgery tax technology tips town toys
training university vacations ventures vision watch wiki
""".split()

_CC = """
ac ad ae af ag al an ao aq ar as at au aw ax az ba bb bd be bf bg bh bi bj
bm bn bo br bs bt bv bw by bz ca cd cf cg ch ci ck cl cm cn cr cu cv cw cx
cy cz de dj dk dm do dz ec ee eg er es et eu fi fj fk fo fr ga gb ge gf gh
gi gl gm gn gp gq gr gt gu gw gy hk hm hn hr ht hu id ie il in iq ir is it
je jm jo jp ke kg kh ki km kn kp kr kw ky kz la lb lc li lk lr ls lt lu lv
ma mc md mg mh mk ml mm mn mo mp mq mr mt mu mv mw mx my mz na nc ne nf
ng ni nl no np nr nz om pa pe pf pg ph pk pl pm pn pr ps pt pw py qa re ro
rs ru rw sa sb sc sd se sg si sj sk sl sm sn so sr ss st su sv sx sy sz tc
td tf tg th tj tk tl tm tn tt tr tw tz ua ug uk us uy uz va vc ve vg vi vn
vu wf ye yt za zm zw
""".split()

_SLD = """
co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk police.uk
com.au net.au org.au edu.au gov.au id.au asn.au
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz maori.nz
co.jp ne.jp or.jp go.jp ac.jp ad.jp ed.jp gr.jp lg.jp
co.kr or.kr ne.kr go.kr re.kr pe.kr ac.kr
com.br net.br org.br gov.br edu.br
co.in net.in org.in gov.in ac.in firm.in gen.in ind.in res.in edu.in
com.cn net.cn org.cn gov.cn edu.cn ac.cn
com.mx org.mx net.mx gob.mx edu.mx
com.ar net.ar org.ar gob.ar edu.ar
co.za net.za org.za gov.za web.za ac.za
com.sg net.sg org.sg gov.sg edu.sg per.sg
com.my net.my org.my gov.my edu.my
com.hk net.hk org.hk gov.hk edu.hk idv.hk
com.tw net.tw org.tw gov.tw edu.tw idv.tw
com.tr net.tr org.tr gov.tr edu.tr web.tr
co.il net.il org.il gov.il ac.il muni.il
com.ua net.ua org.ua gov.ua edu.ua in.ua
com.pl net.pl org.pl edu.pl gov.pl waw.pl
com.es nom.es org.es gob.es edu.es
com.pt edu.pt gov.pt org.pt net.pt
co.th in.th ac.th go.th or.th net.th
com.vn net.vn org.vn gov.vn edu.vn
com.ph net.ph org.ph gov.ph edu.ph
co.id com.id net.id or.id go.id ac.id web.id my.id
com.eg net.eg org.eg gov.eg edu.eg
com.sa net.sa org.sa gov.sa edu.sa med.sa
com.ng net.ng org.ng gov.ng edu.ng
co.ke or.ke ne.ke go.ke ac.ke
co.at or.at ac.at gv.at
gov.it edu.it
""".split()

_PRIVATE = """
github.io gitlab.io blogspot.com herokuapp.com appspot.com netlify.app
vercel.app pages.dev web.app firebaseapp.com azurewebsites.net
cloudfront.net amazonaws.com s3.amazonaws.com elb.amazonaws.com fastly.net
github.dev readthedocs.io wordpress.com neocities.org surge.sh fly.dev
onrender.com glitch.me repl.co workers.dev
""".split()
# fmt: on

EXACT: frozenset[str] = frozenset(_GENERIC) | frozenset(_CC) | frozenset(_SLD) | frozenset(_PRIVATE)

# `*.X` rules: any single label under X is a public suffix
WILDCARDS: frozenset[str] = frozenset("bd ck er fk jm kh mm np pg".split())

# `!D` rules: D is explicitly NOT a public suffix (beats a wildcard match)
EXCEPTIONS: frozenset[str] = frozenset(["www.ck"])


def rules() -> dict[str, frozenset[str]]:
    return {"exact": EXACT, "wildcards": WILDCARDS, "exceptions": EXCEPTIONS}
