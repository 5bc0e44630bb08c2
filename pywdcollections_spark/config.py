"""Collection configuration — the schema-as-config of the reference.

A reference ``Collection`` subclass declares name / main_type /
properties / languages / excluded_types / templates
(pywdcollections.py:22-45, README.md:17-33). Here the same declaration
becomes a dataclass whose ``template_map_rows()`` flattens the nested
``templates`` dict into rows for a broadcast DataFrame — the mapping
join replaces the reference's per-param dict lookups
(pywdcollections.py:349-393).

Template value forms (mirroring the reference):
 * ``int`` — positional template: only the first parameter is
   harvested (pywdcollections.py:386-393).
 * ``dict[param_name, prop]`` — named parameters; prop may be an int
   or the split-coordinate pseudo-props ``'625a'``/``'625b'``
   (pywdcollections.py:370-382).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pywdcollections_spark.registry import datatype_of


@dataclass
class CollectionConfig:
    name: str
    main_type: int | None = None
    properties: list[int] = field(default_factory=list)
    mandatory_properties: list[int] = field(default_factory=list)
    languages: list[str] = field(default_factory=lambda: ["en"])
    excluded_types: list[int] = field(default_factory=list)
    country: int | None = None
    # {site_id: {TemplateName: prop | {param: prop}}}
    templates: dict = field(default_factory=dict)

    def harvested_props(self, site_id: str) -> list[str]:
        """Distinct property ids (as strings) harvestable on a site —
        reference ``list_props_for_site_id`` incl. the a/b suffix strip
        (pywdcollections.py:226-238)."""
        props = []
        for params in self.templates.get(site_id, {}).values():
            if isinstance(params, dict):
                for prop in params.values():
                    p = format(prop).replace("a", "").replace("b", "")
                    if int(p) in self.properties:
                        props.append(p)
            elif isinstance(params, int):
                if params in self.properties:
                    props.append(format(params))
        return sorted(set(props))

    def template_map_rows(self) -> list[dict]:
        """Flatten ``templates`` to broadcast-join rows.

        Columns: site, template_lc, param_lc (NULL = positional),
        prop_key ('625'/'625a'/'625b'/... as declared), pred
        ('P625'...), datatype. Template and param names are lowercased
        once here — the reference lowercases per page via
        copy_with_lowercase_keys (pywdcollections.py:294-305,334).
        """
        rows = []
        allowed = set(self.properties) if self.properties else None
        for site, tmap in self.templates.items():
            for tname, params in tmap.items():
                if isinstance(params, dict):
                    for param, prop in params.items():
                        key = format(prop)
                        pid = int(key.replace("a", "").replace("b", ""))
                        if allowed is not None and pid not in allowed:
                            continue  # props filter (pywdcollections.py:339-341,367)
                        rows.append({
                            "site": site,
                            "template_lc": tname.lower(),
                            "param_lc": param.lower(),
                            "prop_key": key,
                            "pred": f"P{pid}",
                            "datatype": datatype_of(pid),
                        })
                elif isinstance(params, int):
                    if allowed is not None and params not in allowed:
                        continue
                    rows.append({
                        "site": site,
                        "template_lc": tname.lower(),
                        "param_lc": None,
                        "prop_key": format(params),
                        "pred": f"P{params}",
                        "datatype": datatype_of(params),
                    })
        return rows


def demo_config() -> CollectionConfig:
    """The README's own example collection (README.md:17-33): a
    cemeteries-style collection harvesting Commonscat + infobox params.
    Used by fixtures, tests, entry() and bench."""
    return CollectionConfig(
        name="cemeteries",
        main_type=39614,
        properties=[17, 18, 131, 373, 625, 856, 281, 1866, 2971, 571],
        languages=["en", "fr", "de"],
        templates={
            "enwiki": {
                "Commonscat": 373,
                "Infobox cemetery": {
                    "image": 18,
                    "location": 131,
                    "country": 17,
                    "coordinates": 625,
                    "lat": "625a",
                    "lon": "625b",
                    "website": 856,
                    "established": 571,
                    "postal_code": 281,
                    "graves": 2971,
                    "diocese_id": 1866,
                },
                "Location": 625,
            },
            "frwiki": {
                "Autres projets": {"commons": 373},
                "Infobox cimetière": {
                    "image": 18,
                    "localisation": 131,
                    "pays": 17,
                    "coordonnées": 625,
                    "site web": 856,
                },
            },
            "dewiki": {
                "Commonscat": 373,
                "Infobox Friedhof": {"bild": 18, "ort": 131},
            },
        },
    )
