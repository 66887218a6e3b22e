PREFIX : <http://example/>
INSERT { ?s :from ?g } USING :g1 USING NAMED :g2 WHERE { ?s :p ?o . GRAPH ?g { ?s2 :p ?o2 } }
