PREFIX : <http://example/>
INSERT { << ?s :p ?o >> :src :doc1 } WHERE { ?s :p ?o }
