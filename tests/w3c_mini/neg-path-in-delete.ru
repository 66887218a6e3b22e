PREFIX : <http://example/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
DELETE { ?s :r+ ?o } WHERE { ?s :r ?o }
