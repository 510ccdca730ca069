"""PROV + organization record templating.

Byte-compatible with the reference's Go text/templates:

- prov graph: /root/reference/internal/summoner/acquire/prov.go:31-79
  (URN pattern ``urn:<bucket>:<source>:<sha>`` at prov.go:133; object
  name ``prov/<source>/<sha1(prov)>.jsonld`` at prov.go:98). NOTE the
  template field is named SHA256 but receives the SHA-1 (prov.go:88).
- org JSON-LD: /root/reference/internal/organizations/org.go:20-35,
  converted to N-Quads for the ``orgs/<name>.nq`` object
  (org.go:72-82). Without a JSON-LD→RDF library in the sandbox the
  N-Quads conversion uses a deterministic flat serializer for the
  fixed org-template shape (import-gated: uses pyld when available).
"""

from __future__ import annotations

import json

from .fixups import sha1_hex

PROV_TEMPLATE = """{
	"@context": {
	  "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
	  "prov": "http://www.w3.org/ns/prov#",
	  "rdfs": "http://www.w3.org/2000/01/rdf-schema#"
	},
	"@graph": [
	  {
		"@id": "%(PID)s",
		"@type": "prov:Organization",
		"rdf:name": "%(PNAME)s",
		"rdfs:seeAlso": "%(DOMAIN)s"
	  },
	  {
		"@id": "%(RESID)s",
		"@type": "prov:Entity",
		"prov:wasAttributedTo": {
		  "@id": "%(PID)s"
		},
		"prov:value": "%(RESID)s"
	  },
	  {
		"@id": "https://gleaner.io/id/collection/%(SHA256)s",
		"@type": "prov:Collection",
		"prov:hadMember": {
		  "@id": "%(RESID)s"
		}
	  },
	  {
		"@id": "%(URN)s",
		"@type": "prov:Entity",
		"prov:value": "%(SHA256)s.jsonld"
	  },
	  {
		"@id": "https://gleaner.io/id/run/%(SHA256)s",
		"@type": "prov:Activity",
		"prov:endedAtTime": {
		  "@value": "%(DATE)s",
		  "@type": "http://www.w3.org/2001/XMLSchema#dateTime"
		},
		"prov:generated": {
		  "@id": "%(URN)s"
		},
		"prov:used": {
		  "@id": "https://gleaner.io/id/collection/%(SHA256)s"
		}
	  }
	]
  }"""

ORG_TEMPLATE = """{
		"@context": {
			"@vocab": "https://schema.org/"
		},
		"@id": "https://gleaner.io/id/org/%(Name)s",
		"@type": "Organization",
		"url": "%(URL)s",
		"name": "%(Name)s",
		 "identifier": {
			"@type": "PropertyValue",
			"@id": "%(PID)s",
			"propertyID": "https://registry.identifiers.org/registry/doi",
			"url": "%(PID)s",
			"description": "Persistent identifier for this organization"
		}
	}"""


def prov_graph(bucket: str, source_name: str, sha: str, url: str, *,
               pid: str = "unknown", pname: str = "unknown",
               domain: str = "unknown", date: str = "1970-01-01") -> tuple[str, str, str]:
    """Render the prov JSON-LD; returns (prov_jsonld, prov_sha, urn).

    ``date`` is injected (yyyy-MM-dd) rather than read from the clock
    so the pipeline stays deterministic and testable; provOGraph uses
    time.Now() (prov.go:117,137).
    """
    urn = f"urn:{bucket}:{source_name}:{sha}"
    doc = PROV_TEMPLATE % {
        "PID": pid, "PNAME": pname, "DOMAIN": domain,
        "RESID": url, "SHA256": sha, "DATE": date, "URN": urn,
    }
    return doc, sha1_hex(doc), urn


def org_jsonld(name: str, url: str, pid: str) -> str:
    """BuildOrgJSONLD (org.go:90-118): errors on empty Name/URL/PID."""
    for field_name, val in (("PID", pid), ("Name", name), ("URL", url)):
        if not val:
            raise ValueError(f"source {name} is missing required field {field_name}")
    return ORG_TEMPLATE % {"Name": name, "URL": url, "PID": pid}


def org_nquads(name: str, url: str, pid: str) -> str:
    """JSON-LD → N-Quads via the real expansion engine (core/rdf.py),
    matching the reference's JLD2nq (proc.ToRDF with
    Format=application/n-quads, common/jld2nq.go:13-33): sorted
    N-Quad lines; the identifier node is the PID IRI (the template
    gives it an ``@id``, so it is NOT a blank node)."""
    from . import rdf

    doc = json.loads(org_jsonld(name, url, pid))
    return rdf.to_nquads(doc)
