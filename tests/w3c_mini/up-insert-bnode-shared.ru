PREFIX : <http://example/>
INSERT { ?s :link _:b . _:b :label "n" } WHERE { GRAPH :g1 { ?s :q ?o } }
