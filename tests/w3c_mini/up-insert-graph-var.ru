PREFIX : <http://example/>
INSERT { GRAPH ?g { :new :in ?g } } WHERE { GRAPH ?g { ?s :p ?o } }
