"""Target-TSV model loader (S9) + BFS depths (C10), mirroring the
reference's localhost_target semantics (StaticModelerTest.java:54-132)."""

from smart_crawler_spark.datagen.site import SiteConfig, target_tsv
from smart_crawler_spark.sources.targets import load_target_tsv

TSV = """home\tlink\t(//ul[@id='menu']/li/a)[1]\tdir1\tmenu
home\tlink\t(//ul[@id='menu']/li/a)[2]\tdir2\tmenu
home\tlink\t(//ul[@id='menu']/li/a)[3]\tabout\tmenu
dir2\tlink\t//div[@id='content']/ul/li/a\tdetail\tlist
dir1\tlink\t//a[@id='page']\tdir1\tNEXT
dir1\tlink\t//div[@id='content']/ul/li/a\tdetail\tlist
detail\tlink\t(//div[@id='content']/div[@class]/ul/li/a)[1]\tdir1\tmenu
detail\tstring\t//h1/text()\ttitle
about\tstring\t//p/text()
"""


def test_parse_and_depths():
    m = load_target_tsv(TSV)
    assert m.root == "home"
    assert m.depths == {"home": 0, "dir1": 1, "dir2": 1, "about": 1, "detail": 2}
    types = {(e["src_class"], e["xpath"]): e["link_type"] for e in m.class_links}
    assert types[("dir1", "//a[@id='page']")] == "singleton"
    assert types[("dir1", "//div[@id='content']/ul/li/a")] == "list"
    assert types[("home", "(//ul[@id='menu']/li/a)[1]")] == "menu"
    singleton = next(e for e in m.class_links if e["link_type"] == "singleton")
    assert singleton["anchor_text"] == "NEXT"
    assert [d["field_name"] for d in m.data_links] == ["title", None]
    assert m.data_links[1]["src_class"] == "about"


def test_generated_target_parses():
    cfg = SiteConfig(n_hosts=1, dirs=3, chain=2, details_per_page=2)
    m = load_target_tsv(target_tsv(cfg))
    assert m.root == "home"
    assert m.depths["home"] == 0
    assert m.depths["detail"] == 2
    assert {m.depths[f"dir{i}"] for i in range(3)} == {1}
    # data links in file order: title, caption, photo, back
    detail_fields = [d["field_name"] for d in m.data_links if d["src_class"] == "detail"]
    assert detail_fields == ["title", "caption", "photo", "back"]


def test_menu_rows_reference_dialect():
    """Menu rows load per PageClass.loadMenuLink + MenuItem.getXpath:
    fixed-menu rows (href + menu xpath + 'fixed') become href-predicated
    navigation xpaths byte-equal to the reference's saved models
    (StaticModelerTest.java:113-118); positional rows ((xp)[i], empty
    menu columns — targets/localhost_target.csv) stay positional."""
    menu_xp = '/html/body/div/div/div/ul[@id="menu"]/li/a'
    tsv = "\n".join(
        [
            f"home\tlink\t/table.html\ttable\tmenu\t{menu_xp}\tfixed",
            f"home\tlink\t/about.html\tabout\tmenu\t{menu_xp}\tfixed",
            "home\tlink\t(//ul[@id='menu']/li/a)[1]\tdir1\tmenu",
            "table\tstring\t//h1/text()",
        ]
    )
    m = load_target_tsv(tsv)
    xps = {e["xpath"]: e for e in m.class_links}
    assert f'{menu_xp}[@href="/table.html"]' in xps
    assert f'{menu_xp}[@href="/about.html"]' in xps
    assert "(//ul[@id='menu']/li/a)[1]" in xps  # positional unchanged
    fixed = xps[f'{menu_xp}[@href="/table.html"]']
    assert fixed["menu_type"] == "fixed" and fixed["menu_href"] == "/table.html"
    assert fixed["dst_class"] == "table" and m.depths["table"] == 1


def test_spark_views(spark):
    m = load_target_tsv(TSV)
    cl = m.class_links_df(spark)
    assert cl.filter("link_type = 'list'").count() == 2
    assert (
        cl.filter("src_class = 'home'").agg({"dst_depth": "max"}).first()[0] == 1
    )
    dl = m.data_links_df(spark)
    assert dl.count() == 2
    assert m.classes_df(spark).count() == 5
