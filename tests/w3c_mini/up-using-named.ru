PREFIX : <http://example/>
INSERT { ?g :has ?s } USING NAMED :g1 WHERE { GRAPH ?g { ?s :p ?o } }
