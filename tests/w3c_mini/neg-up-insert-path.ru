PREFIX : <http://example/>
INSERT { ?s :p+ ?o } WHERE { ?s :p ?o }
