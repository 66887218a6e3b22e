PREFIX : <http://example/>
DELETE { GRAPH ?g { ?s :p ?o } } USING NAMED :g1 USING NAMED :g2
WHERE { GRAPH ?g { ?s :p ?o } }
