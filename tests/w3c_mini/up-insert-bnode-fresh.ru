PREFIX : <http://example/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
INSERT { ?s :tag [] } WHERE { ?s :p ?o }
