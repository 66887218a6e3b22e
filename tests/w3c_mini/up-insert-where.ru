PREFIX : <http://example/>
INSERT { ?s :q ?o } WHERE { ?s :p ?o }
