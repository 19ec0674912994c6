"""Public-suffix logic (F2/F3 in SURVEY.md §2.8).

Re-implements the subset of Guava's ``InternetDomainName`` used by the
reference (URL.java:68-75): ``topPrivateDomain`` and
``isUnderPublicSuffix``, against a vendored, pinned snapshot of the public
suffix list (https://publicsuffix.org, MPL-2.0 data).  The snapshot below is
a deliberately small, deterministic subset that covers every suffix
exercised by the reference's test vectors (URLTest.java:49-214) plus the
common TLDs our synthetic crawl fixtures generate.  On a production
cluster, drop a full ``public_suffix_list.dat`` next to this file and it is
picked up automatically.

Rule semantics follow the PSL algorithm:
  * a rule matches a host if the rule's labels equal the host's trailing
    labels (``*`` matches exactly one label);
  * exception rules (``!``) win over wildcard rules and denote that the
    matched suffix is one label SHORTER;
  * the public suffix is the longest matching rule;
  * unlike the raw PSL algorithm, Guava does NOT apply the implicit ``*``
    default rule when answering ``isUnderPublicSuffix`` — an unlisted TLD
    (e.g. ``http://test``) has no public suffix and is rejected
    (URLTest.java:169).  We reproduce Guava's behavior.

The registrable domain (Guava ``topPrivateDomain``) is the public suffix
plus one preceding label.
"""

from __future__ import annotations

import os
from functools import lru_cache

# Pinned snapshot (subset). One rule per line; comments and blanks ignored.
_PSL_SNAPSHOT = """
// generic TLDs
com
net
org
edu
gov
mil
int
info
biz
name
pro
mobi
travel
museum
aero
coop
jobs
cat
asia
tel
post
xxx
io
ai
app
dev
xyz
online
site
club
shop
top
me
tv
cc
co
// country TLDs
ac
ad
ae
af
ag
al
am
ao
ar
as
at
au
aw
ax
az
ba
bb
bd
be
bf
bg
bh
bi
bj
bm
bn
bo
br
bs
bt
bw
by
bz
ca
cd
cf
cg
ch
ci
cl
cm
cn
cr
cu
cv
cw
cx
cy
cz
de
dj
dk
dm
do
dz
ec
ee
eg
es
et
eu
fi
fj
fk
fm
fo
fr
ga
gd
ge
gf
gg
gh
gi
gl
gm
gn
gp
gq
gr
gs
gt
gu
gw
gy
hk
hm
hn
hr
ht
hu
id
ie
il
im
in
iq
ir
is
it
je
jm
jo
jp
ke
kg
kh
ki
km
kn
kp
kr
kw
ky
kz
la
lb
lc
li
lk
lr
ls
lt
lu
lv
ly
ma
mc
md
mg
mh
mk
ml
mm
mn
mo
mp
mq
mr
ms
mt
mu
mv
mw
mx
my
mz
na
nc
ne
nf
ng
ni
nl
no
np
nr
nu
nz
om
pa
pe
pf
pg
ph
pk
pl
pm
pn
pr
ps
pt
pw
py
qa
re
ro
rs
ru
rw
sa
sb
sc
sd
se
sg
sh
si
sk
sl
sm
sn
so
sr
ss
st
sv
sx
sy
sz
tc
td
tf
tg
th
tj
tk
tl
tm
tn
to
tr
tt
tw
tz
ua
ug
uk
us
uy
uz
va
vc
ve
vg
vi
vn
vu
wf
ws
ye
yt
za
zm
zw
// second-level rules (the ones the reference's tests rely on + common ones)
co.uk
org.uk
net.uk
ac.uk
gov.uk
me.uk
ltd.uk
plc.uk
sch.uk
nhs.uk
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
co.jp
or.jp
ne.jp
ac.jp
go.jp
ad.jp
ed.jp
gr.jp
lg.jp
com.br
net.br
org.br
gov.br
edu.br
co.nz
net.nz
org.nz
govt.nz
ac.nz
co.za
org.za
net.za
gov.za
ac.za
web.za
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
co.in
net.in
org.in
firm.in
gen.in
ind.in
ac.in
edu.in
res.in
gov.in
com.mx
org.mx
net.mx
gob.mx
edu.mx
com.ar
net.ar
org.ar
gob.ar
edu.ar
com.sg
net.sg
org.sg
edu.sg
gov.sg
com.hk
net.hk
org.hk
edu.hk
gov.hk
com.tw
net.tw
org.tw
edu.tw
gov.tw
co.kr
or.kr
ne.kr
re.kr
go.kr
ac.kr
com.tr
net.tr
org.tr
edu.tr
gov.tr
com.ua
net.ua
org.ua
edu.ua
gov.ua
co.il
org.il
net.il
ac.il
gov.il
com.my
net.my
org.my
edu.my
gov.my
co.th
in.th
or.th
ac.th
go.th
com.vn
net.vn
org.vn
edu.vn
gov.vn
com.ph
net.ph
org.ph
edu.ph
gov.ph
com.eg
net.eg
org.eg
edu.eg
gov.eg
co.ke
or.ke
ne.ke
ac.ke
go.ke
com.ng
net.ng
org.ng
edu.ng
gov.ng
com.pk
net.pk
org.pk
edu.pk
gov.pk
com.bd
net.bd
org.bd
edu.bd
gov.bd
com.np
net.np
org.np
edu.np
gov.np
com.lk
net.lk
org.lk
edu.lk
gov.lk
// wildcard + exception examples (PSL rule-engine coverage)
*.ck
!www.ck
*.bd
*.er
*.fk
*.mm
"""


def _load_rules() -> tuple[frozenset[str], frozenset[str], frozenset[str]]:
    """Returns (exact_rules, wildcard_parents, exception_rules).

    The vendored list is read through importlib.resources so it also
    resolves when the package ships as a ``spark-submit --py-files``
    zip (zipimport has no real filesystem path); the embedded snapshot
    is the last-resort fallback."""
    text = None
    try:
        from importlib import resources

        res = resources.files(__package__) / "public_suffix_list.dat"
        if res.is_file():
            text = res.read_text(encoding="utf-8")
    except Exception:
        text = None
    if text is None:
        path = os.path.join(
            os.path.dirname(__file__), "public_suffix_list.dat"
        )
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                text = f.read()
        else:
            text = _PSL_SNAPSHOT
    exact, wild, exc = set(), set(), set()
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0].lower()
        if line.startswith("!"):
            exc.add(line[1:])
        elif line.startswith("*."):
            wild.add(line[2:])
        else:
            exact.add(line)
    return frozenset(exact), frozenset(wild), frozenset(exc)


_EXACT, _WILD, _EXC = _load_rules()


@lru_cache(maxsize=65536)
def public_suffix(host: str) -> str | None:
    """Longest public suffix of ``host``, or None if it has none.

    ``host`` must already be lowercased, without a trailing dot.
    """
    labels = host.split(".")
    n = len(labels)
    # Scan candidate suffixes from longest to shortest; exception rules make
    # the suffix one label shorter than the wildcard they carve out of.
    best = None
    for i in range(n):
        cand = ".".join(labels[i:])
        if cand in _EXC:
            # exception: the public suffix is cand minus its first label
            rest = ".".join(labels[i + 1:])
            return rest if rest else None
        if cand in _EXACT:
            best = cand
            break
        # wildcard *.parent matches cand if cand == label + "." + parent
        if i + 1 < n and ".".join(labels[i + 1:]) in _WILD:
            best = cand
            break
    return best


def is_under_public_suffix(host: str) -> bool:
    """Guava ``InternetDomainName.isUnderPublicSuffix`` (URL.java:72-75)."""
    ps = public_suffix(host)
    return ps is not None and ps != host


def top_private_domain(host: str) -> str | None:
    """Guava ``topPrivateDomain().name()`` (URL.java:68-70).

    The registrable domain = public suffix + one preceding label.  Returns
    None when the host is not under a public suffix.
    """
    ps = public_suffix(host)
    if ps is None or ps == host:
        return None
    ps_labels = ps.count(".") + 1
    labels = host.split(".")
    return ".".join(labels[-(ps_labels + 1):])
