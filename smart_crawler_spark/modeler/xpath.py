"""XPath refinement lattice (SURVEY M2/M3) — pure Python, used inside
pandas UDFs and the refinement superstep.

Re-expresses the reference's granularity lattice
(``modeler/model/XPath.java:59-193``, ``XPathTag.java:90-205``,
``XPathAttribute.java:44-110``):

- every tag on the node→root chain has a 0/1/2 flag per attribute
  (omitted / name only / name+value) and a use bit;
- **default version** (``XPath.java:34-57`` doctest +
  ``DynamicModelerTest`` expectations, e.g. ``//ul[@id="menu"]/li/a``):
  the path is cut at the nearest ancestor carrying an ``id`` (that tag
  renders ``[@id="value"]``); the anchor keeps all attribute names
  (``href`` and namespaced attrs excluded); intermediate tags keep their
  first attribute name;
- ``finer()`` enables one step of granularity on the LAST incrementable
  tag (enable tag → add attr name → add attr value); ``coarser()``
  removes one step from the FIRST decrementable tag; ``finest()`` /
  ``coarsest()`` jump to the lattice extremes (coarsest keeps only the
  anchor tag: ``//a``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class XPathAttribute:
    name: str
    value: str
    flag: int = 0  # 0 omitted, 1 @name, 2 @name="value"

    def can_increment(self) -> bool:
        return self.flag < 2

    def can_decrement(self) -> bool:
        return self.flag > 0

    def render(self) -> str:
        if self.flag <= 0:
            return ""
        if self.flag == 1:
            return f"@{self.name}"
        return f'@{self.name}="{self.value}"'


@dataclass
class XPathTag:
    name: str
    index: int  # 0 = anchor, increasing toward the root
    attributes: list[XPathAttribute] = field(default_factory=list)
    use: bool = True

    @property
    def has_id(self) -> bool:
        return any(a.name == "id" for a in self.attributes)

    def set_id(self, with_value: bool = True) -> None:
        for a in self.attributes:
            if a.name == "id":
                a.flag = 2 if with_value else 1
                return

    def set_all_attributes(self) -> None:
        for a in self.attributes:
            if a.can_increment():
                a.flag = max(a.flag, 1)

    def set_first_attribute(self) -> None:
        for a in self.attributes:
            if a.can_increment():
                a.flag = max(a.flag, 1)
                return

    def set_finest(self) -> None:
        self.use = True
        for a in self.attributes:
            a.flag = 2

    def omit(self) -> None:
        if self.index != 0:
            self.use = False
        for a in self.attributes:
            a.flag = 0

    def can_increment(self) -> bool:
        return (not self.use) or any(a.can_increment() for a in self.attributes)

    def can_decrement(self) -> bool:
        return (self.use and self.index != 0) or any(
            a.can_decrement() for a in self.attributes
        )

    def increment(self) -> None:
        if not self.use:
            self.use = True
            return
        for a in self.attributes:
            if a.can_increment():
                a.flag += 1
                return

    def decrement(self) -> None:
        # reference XPathTag.decrement: last decrementable attribute,
        # else disable the tag
        for a in reversed(self.attributes):
            if a.can_decrement():
                a.flag -= 1
                return
        self.use = False

    def render(self) -> str:
        if not self.use:
            return ""
        vals = " and ".join(
            a.render() for a in self.attributes if a.can_decrement()
        )
        return f"{self.name}[{vals}]" if vals else self.name


class XPath:
    """A refinable root-to-node path. ``chain`` runs anchor → root:
    [(tag_name, [(attr, value), ...]), ...]."""

    def __init__(self, chain: list[tuple[str, list[tuple[str, str]]]]):
        self.tags: list[XPathTag] = []
        id_found = False
        for index, (name, attrs) in enumerate(chain):
            tag = XPathTag(name, index)
            for attr, value in attrs:
                if index > 0 or (attr != "href" and ":" not in attr):
                    tag.attributes.append(XPathAttribute(attr, value))
            if not id_found:
                if tag.has_id:
                    tag.set_id(with_value=True)
                    id_found = True
                elif index == 0:
                    tag.set_all_attributes()
                else:
                    tag.set_first_attribute()
            else:
                # cut above the nearest id ancestor: tags stay in the
                # lattice (finer() may re-enable them) but render empty,
                # collapsing into the '//' prefix
                tag.use = False
            self.tags.append(tag)
        self.default = self.get()

    # tags are kept anchor-first internally; rendering is root-first
    def get(self) -> str:
        parts = [t.render() for t in reversed(self.tags)]
        # unused leading tags collapse into the '//' prefix
        # (XPath.get: '/' + tags + replaceFirst("///+","//")); a chain
        # whose root tag IS used keeps the single-slash absolute form
        anchored = bool(parts) and parts[0] != ""
        body = "/".join(p for p in parts if p != "")
        if not body:
            return "//"
        return ("/" if anchored else "//") + body

    def finer(self) -> str:
        """One granularity step on the last incrementable tag (nearest
        the root in reference sort order = nearest the ANCHOR here,
        matching ``XPath.finer``'s reduce-to-last on root-first order)."""
        for t in self.tags:  # anchor-first == last in root-first order
            if t.can_increment():
                t.increment()
                return self.get()
        return ""

    def coarser(self) -> str:
        """One step off the first decrementable tag (root side)."""
        for t in reversed(self.tags):
            if t.can_decrement():
                t.decrement()
                return self.get()
        return ""

    def finest(self) -> str:
        for t in self.tags:
            t.set_finest()
        return self.get()

    def coarsest(self) -> str:
        for t in self.tags:
            t.omit()
        return self.get()

    def refine(self, finer: bool) -> bool:
        return (self.finer() if finer else self.coarser()) != ""
